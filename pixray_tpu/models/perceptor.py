"""Perceptor layer: the uniform frozen-scoring-model API over CLIP/SLIP towers.

Parity with /root/reference/slip.py (CLIP_Base, SLIP_Base, get_clip_perceptor):
``encode_image`` / ``encode_text`` / ``input_resolution`` / ``output_dim``, with
the per-family preprocessing stats (CLIP vs ImageNet) and the reference's
batch-range adjustment (slip.py:21-42: stretch the batch to [0,1] by its min/max
before standardizing).

TPU design: ``image_fn(variables, images)`` is a PURE function suitable for use
inside the engine's jitted step; the perceptor object only carries the variables
pytree and static metadata.  Text encoding happens host-side at init.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pixray_tpu.ops.grad import l2_normalize

from .clip.configs import (
    CLIP_CONFIGS,
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    SLIP_CONFIGS,
)
from .clip.model import CLIP
from .clip.tokenizer import tokenize


def adjust_range_affine(img, out_lo=0.0, out_hi=1.0):
    """Coefficients ``(a, b)`` with ``img * a + b == adjust_range(img, ...)``.

    Single source of truth for the batch range-stretch (slip.py:21-42) —
    both the materialized path (:func:`adjust_range`) and the deferred path
    (:meth:`Perceptor.preprocess_affine`) derive from this so they cannot
    diverge.
    """
    minv = jnp.min(img).astype(jnp.float32)
    span = jnp.max(img).astype(jnp.float32) - minv
    inv = jnp.where(span != 0, 1.0 / jnp.where(span != 0, span, 1.0), 1.0)
    a = inv * (out_hi - out_lo)
    b = -minv * inv * (out_hi - out_lo) + out_lo
    return a, b


def adjust_range(img, out_lo=0.0, out_hi=1.0):
    """Stretch a batch to [out_lo, out_hi] by its global min/max (slip.py:21-42)."""
    a, b = adjust_range_affine(img, out_lo, out_hi)
    return img * a + b


_CKPT_ALIASES = {
    "TinyTest": ["tinytest.pt"],  # offline converter/e2e validation harness
    "ViT-B/32": ["ViT-B-32.pt", "vit_b_32.pt"],
    "ViT-B/16": ["ViT-B-16.pt", "vit_b_16.pt"],
    "ViT-L/14": ["ViT-L-14.pt"],
    "RN50": ["RN50.pt"],
    "RN101": ["RN101.pt"],
    "RN50x4": ["RN50x4.pt"],
    "RN50x16": ["RN50x16.pt"],
    # SLIP family (reference slip.py:90-110)
    "SLIP_VITS16": ["slip_small_100ep.pt"],
    "SLIP_VITB16": ["slip_base_100ep.pt"],
    "SLIP_VITL16": ["slip_large_100ep.pt"],
    "SIMCLR_VITS16": ["simclr_small_25ep.pt"],
    "CLIP_VITS16": ["clip_small_25ep.pt"],
    "CLIP_VITB16": ["clip_base_25ep.pt"],
    "CLIP_VITL16": ["clip_large_25ep.pt"],
    "SLIP_CC3M": ["slip_base_cc3m_40ep.pt"],
    "SLIP_CC12M": ["slip_base_cc12m_35ep.pt"],
}


# SLIP checkpoint URLs (reference slip.py:112-115); OpenAI CLIP .pt archives are
# served from openaipublic and auto-fetched by name
_SLIP_URL = "https://dl.fbaipublicfiles.com/slip/{}"
_OPENAI_URLS = {
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
}


def _try_download(name: str):
    """Fetch weights into models/ on first use (reference auto-download parity)."""
    from pixray_tpu.utils.download import wget_file

    aliases = _CKPT_ALIASES.get(name, [])
    if not aliases:
        return None
    out = os.path.join("models", aliases[0])
    if name in _OPENAI_URLS:
        url = _OPENAI_URLS[name]
    elif name in SLIP_CONFIGS:
        url = _SLIP_URL.format(aliases[0])
    else:
        return None
    return out if wget_file(url, out) else None


def _find_checkpoint(name: str):
    search_dirs = [
        os.environ.get("PIXRAY_TPU_MODELS", ""),
        "models",
        os.path.expanduser("~/.cache/pixray_tpu"),
    ]
    for d in search_dirs:
        if not d:
            continue
        for alias in _CKPT_ALIASES.get(name, []):
            path = os.path.join(d, alias)
            if os.path.exists(path):
                return path
    return None


# dense submodules QuantDense serves inside the ViT trunk (model.py)
_QUANT_DENSE_NAMES = frozenset({"in_proj", "out_proj", "mlp_fc", "mlp_proj"})


def build_quant_collection(params, patch_size=None):
    """Mirror of the VISUAL tower's params tree holding pre-quantized
    (kernel_q s8, kernel_s f32) pairs for every QuantDense kernel — the
    text tower always runs at the compute dtype (one-shot at init).

    The patch-embedding kernel is pre-quantized in BOTH row orders
    (channels-fastest + channel-major) since the data_format is a call-time
    choice; the preprocessing affine no longer blocks this — it folds into
    the activations instead (model.py VisionTransformer)."""
    from pixray_tpu.models.clip.model import _kernel_rows_cm
    from pixray_tpu.ops.quant import prequantize_kernel

    def walk(tree, parent):
        out = {}
        for k, v in tree.items():
            if hasattr(v, "items"):
                sub = walk(v, k)
                if sub:
                    out[k] = sub
            elif k == "kernel" and parent in _QUANT_DENSE_NAMES:
                wq, sw = prequantize_kernel(v)
                out["kernel_q"], out["kernel_s"] = wq, sw
            elif k == "patch_embedding" and parent == "visual" and patch_size:
                out["patch_q"], out["patch_s"] = prequantize_kernel(v)
                out["patch_q_cm"], out["patch_s_cm"] = prequantize_kernel(
                    _kernel_rows_cm(v, patch_size)
                )
        return out

    visual = params.get("visual")
    return {"visual": walk(visual, "visual")} if visual is not None else {}


class Perceptor:
    """A frozen scoring model with a pure jit-safe image-embedding function."""

    def __init__(self, name: str, dtype=jnp.bfloat16):
        if name in CLIP_CONFIGS:
            self.config = CLIP_CONFIGS[name]
            mean, std = CLIP_MEAN, CLIP_STD
        elif name in SLIP_CONFIGS:
            self.config = SLIP_CONFIGS[name]
            mean, std = IMAGENET_MEAN, IMAGENET_STD
        else:
            raise ValueError(f"Unknown perceptor: {name} "
                             f"(have {sorted(CLIP_CONFIGS) + sorted(SLIP_CONFIGS)})")
        self.name = name
        self.input_resolution = self.config.image_resolution
        self.output_dim = self.config.embed_dim
        self.mean = jnp.asarray(mean, dtype=jnp.float32)
        self.std = jnp.asarray(std, dtype=jnp.float32)
        # PIXRAY_TPU_CLIP_PREC: "int8b" (dynamically-quantized vision-tower
        # matmuls, int8 forward AND int8 dx backward — the default since
        # round 5: +9% whole-step on the flagship vs bf16 chip-normalized,
        # gated by the bench precision ladder) | "int8" (int8 forward,
        # bf16 dx backward) | "bf16" (compute-dtype matmuls, the r1-r4
        # default and the EXACT_ENV reference) — ops/quant.py
        prec = os.environ.get("PIXRAY_TPU_CLIP_PREC", "int8b")
        quant = prec if (
            dtype == jnp.bfloat16 and prec in ("int8", "int8b")
        ) else "none"
        self.model = CLIP(self.config, dtype=dtype, quant=quant)
        loaded = self._load_variables(name)
        self.variables = self._cast_storage(loaded, dtype)
        if quant != "none" and os.environ.get("PIXRAY_TPU_CLIP_PREQ", "1") == "1":
            # pre-quantize the vision tower's dense kernels ONCE (from the f32
            # originals): the jitted step then consumes s8 weight refs instead
            # of re-deriving them from bf16 every iteration inside the blocked
            # dispatch's scan — ~0.5 GB/step of HBM traffic at ViT-B/32 scale
            # (see ops/quant.py "pre-quantized").  PIXRAY_TPU_CLIP_PREQ=0
            # restores the dynamic in-step weight quantize (A/B knob).
            quant_col = self._build_quant_collection(loaded["params"])
            if quant_col:
                self.variables = dict(self.variables, quant=quant_col)

    def _build_quant_collection(self, params):
        return build_quant_collection(params, self.config.vision_patch_size)

    @staticmethod
    def _cast_storage(variables, dtype):
        """Store matmul weights at the compute dtype (PIXRAY_TPU_CLIP_W16=1,
        the default, when the tower computes in bf16).

        The towers cast every param to the compute dtype at apply time anyway
        (identical rounding), but the cast runs INSIDE the jitted step where
        the weights arrive as per-call arguments — pre-casting halves the
        weight-ref HBM footprint and removes the per-dispatch f32→bf16
        sweeps XLA does not always hoist out of the blocked-dispatch scan.
        Normalization affines stay f32: LayerNorm/BatchNorm apply their
        scale/bias in f32 (model.py LayerNorm), so bf16 storage would change
        (slightly) the one place params are consumed at full precision.
        """
        if dtype != jnp.bfloat16 or os.environ.get("PIXRAY_TPU_CLIP_W16", "1") != "1":
            return variables

        def cast(path, leaf):
            names = {getattr(p, "key", "") for p in path}
            if any(n.startswith(("ln_", "bn", "norm", "downsample_bn")) for n in names):
                return leaf
            if leaf.dtype == jnp.float32:
                return leaf.astype(jnp.bfloat16)
            return leaf

        out = dict(variables)
        out["params"] = jax.tree_util.tree_map_with_path(cast, variables["params"])
        return out

    # ------------------------------------------------------------------ loading
    def _load_variables(self, name):
        ckpt = _find_checkpoint(name)
        if ckpt is None and not name.startswith("TinyTest") and                 os.environ.get("PIXRAY_TPU_NO_DOWNLOAD") != "1":
            ckpt = _try_download(name)
        if ckpt is not None:
            from .clip.convert import (
                convert_hf_clip,
                convert_openai_clip,
                convert_slip_clip,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(ckpt)
            if any(k.startswith("module.") for k in sd):  # SLIP DDP checkpoints
                sd = {k.replace("module.", ""): v for k, v in sd.items()}
            if any(k.startswith("vision_model.") for k in sd):
                variables = convert_hf_clip(sd, self.config)
            elif any(k.startswith("visual.patch_embed") for k in sd):
                variables = convert_slip_clip(sd, self.config)
            else:
                variables = convert_openai_clip(sd, self.config)
            n_params = sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(variables["params"]))
            print(f"Loaded perceptor {name}: {self.input_resolution}px, {n_params / 1e6:.2f}M params")
            self._require_checkpoint_tokenizer(name)
            return jax.tree_util.tree_map(jnp.asarray, variables)

        print(
            f"WARNING: no checkpoint found for perceptor {name} — initializing random "
            f"weights (set $PIXRAY_TPU_MODELS or place weights under models/)."
        )
        import hashlib

        stable = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "big")
        key = jax.random.PRNGKey(stable % (2**31))
        dummy_img = jnp.zeros((1, self.input_resolution, self.input_resolution, 3))
        dummy_tok = jnp.zeros((1, self.config.context_length), dtype=jnp.int32)
        # jit the init: flax runs the module forward for shape inference, and
        # eager op-by-op execution of a full tower is ~10x slower than one
        # compile on the CPU test runners
        return jax.jit(self.model.init)(key, dummy_img, dummy_tok)

    @staticmethod
    def _require_checkpoint_tokenizer(name):
        """Real weights + fallback tokenizer = meaningless text embeddings.

        The reference's value rests on frozen pretrained perceptors fed by
        CLIP's exact BPE ids (/root/reference/slip.py:77-82); silently pairing a
        converted checkpoint with byte-level fallback ids would produce garbage
        scores, so fail loudly (overridable for image-prompt-only workflows).
        """
        from .clip.tokenizer import get_tokenizer

        if get_tokenizer().degraded and os.environ.get(
            "PIXRAY_TPU_ALLOW_DEGRADED_TOKENIZER"
        ) != "1":
            raise RuntimeError(
                f"Perceptor {name!r} loaded REAL checkpoint weights but the CLIP "
                "BPE vocab (bpe_simple_vocab_16e6.txt.gz) is missing — text "
                "embeddings would be meaningless. Place the vocab under models/ "
                "or set $PIXRAY_TPU_BPE; to proceed anyway (image prompts only) "
                "set PIXRAY_TPU_ALLOW_DEGRADED_TOKENIZER=1."
            )

    # ------------------------------------------------------------------- encode
    def preprocess(self, imgs):
        """Batch range-stretch + resize-if-needed + per-channel standardize."""
        imgs = adjust_range(imgs)
        r = self.input_resolution
        if imgs.shape[1] != r or imgs.shape[2] != r:
            imgs = jax.image.resize(imgs, (imgs.shape[0], r, r, 3), method="bilinear")
        return (imgs - self.mean) / self.std

    def preprocess_affine(self, imgs, data_format="NHWC"):
        """Like :meth:`preprocess`, but defers the elementwise math.

        Returns ``(imgs_resized, (scale, shift))`` with
        ``imgs_resized * scale + shift == preprocess(imgs)``: the batch
        range-stretch (slip.py:21-42) and the per-channel standardize are
        jointly a per-channel affine whose coefficients need only the batch
        min/max — the encode folds it into the patch-embedding matmul
        (model.py VisionTransformer) instead of paying full-batch
        elementwise passes.  Bilinear resize commutes with the affine
        exactly (linear, weights sum to 1), so resizing the raw batch first
        is equivalent.
        """
        a, b = adjust_range_affine(imgs)
        scale = a / self.std  # (3,)
        shift = (b - self.mean) / self.std
        r = self.input_resolution
        if data_format == "NCHW":
            if imgs.shape[2] != r or imgs.shape[3] != r:
                imgs = jax.image.resize(
                    imgs, (imgs.shape[0], imgs.shape[1], r, r), method="bilinear"
                )
        elif imgs.shape[1] != r or imgs.shape[2] != r:
            imgs = jax.image.resize(imgs, (imgs.shape[0], r, r, 3), method="bilinear")
        return imgs, (scale, shift)

    def image_fn(self, variables, imgs, apply_preprocess=True, data_format="NHWC"):
        """PURE: (N, H, W, 3) float [0,1] — or (N, 3, H, W) channel-major with
        ``data_format='NCHW'`` — → (N, output_dim) L2-normalized embeddings."""
        if apply_preprocess:
            imgs, aff = self.preprocess_affine(imgs, data_format)
            embeds = self.model.apply(
                variables, imgs, aff, data_format, method=self.model.encode_image
            )
        else:
            embeds = self.model.apply(
                variables, imgs, data_format=data_format,
                method=self.model.encode_image,
            )
        return l2_normalize(embeds.astype(jnp.float32), axis=-1)

    def encode_image(self, imgs, apply_preprocess=True):
        return self.image_fn(self.variables, jnp.asarray(imgs), apply_preprocess)

    def encode_text(self, text):
        """Host-side text embedding; accepts str or list[str]; raw (not normalized)."""
        tokens = jnp.asarray(tokenize(text))
        embeds = self.model.apply(self.variables, tokens, method=self.model.encode_text)
        return embeds.astype(jnp.float32)

    def encode_text_with_stops(self, text):
        """'=' prompt shim (reference pixray.py:864-870): pool the text features at
        the last content token (one before EOT) instead of at EOT."""
        tokens = np.asarray(tokenize(text))
        stops = jnp.asarray(tokens.argmax(axis=-1) - 1)
        embeds = self.model.apply(
            self.variables, jnp.asarray(tokens), stops, method=self.model.encode_text_at
        )
        return embeds.astype(jnp.float32)

    def encode_texts(self, texts):
        embeds = self.encode_text(texts)
        return l2_normalize(embeds, axis=-1)


# persistent perceptor cache (reference pixray.py:633-640, 1058-1060)
_perceptor_cache: dict[str, Perceptor] = {}


def get_clip_perceptor(name: str, dtype=jnp.bfloat16) -> Perceptor:
    if name not in _perceptor_cache:
        _perceptor_cache[name] = Perceptor(name, dtype=dtype)
    return _perceptor_cache[name]
