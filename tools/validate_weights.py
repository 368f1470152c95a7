"""Real-checkpoint validation harness (skippable when weights are absent).

The reference's value rests on frozen PRETRAINED perceptors
(/root/reference/slip.py:173-186, pixray.py:633-640); this tool proves the
converted checkpoints reproduce them.  It runs every check whose assets are
present and writes a machine-readable parity report:

1. **CLIP embedding parity vs torch** — the OpenAI ``.pt`` archives are
   TorchScript: `torch.jit.load` executes the REFERENCE implementation without
   any extra package.  We compare our converted Flax tower against it on fixed
   images/texts and require cosine ≥ 0.999 (contract from
   /root/reference/slip.py:44-74).
2. **Tokenizer** — must be the checkpoint-exact BPE (no byte fallback).
3. **VQGAN decode smoke** — convert a taming ``.ckpt`` (vqgan.py:190-195
   semantics), decode a fixed latent, record output stats.
4. **Convergence** — a 50-iteration pixel-drawer run on a text prompt whose
   final CLIP loss must fall below a recorded threshold (real semantics, not
   just FLOPs).

Usage:  python tools/validate_weights.py [--report PATH]
Checkpoints are searched in $PIXRAY_TPU_MODELS and ./models (the engine's own
search path).  Exit code: 0 = everything present passed (or nothing present),
1 = a check failed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPORT: dict = {"checks": {}, "skipped": {}}


def _record(name, ok, **info):
    REPORT["checks"][name] = {"ok": bool(ok), **info}
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {info}")
    return ok


def _skip(name, why):
    REPORT["skipped"][name] = why
    print(f"[skip] {name}: {why}")


def _fixed_images(n, res, seed=0):
    """Deterministic structured test images (gradients + checker + noise)."""
    rng = np.random.default_rng(seed)
    imgs = []
    for i in range(n):
        y, x = np.mgrid[0:res, 0:res].astype(np.float32) / res
        img = np.stack(
            [
                0.5 + 0.5 * np.sin(6.28 * (i + 1) * x),
                y,
                ((x * 8).astype(int) + (y * 8).astype(int)) % 2,
            ],
            axis=-1,
        )
        img = 0.8 * img + 0.2 * rng.uniform(size=img.shape)
        imgs.append(img.astype(np.float32))
    return np.stack(imgs)


FIXED_TEXTS = [
    "a photo of a cat",
    "an oil painting of a sunrise over mountains",
    "pixel art of a castle",
    "the quick brown fox jumps over the lazy dog",
]


def check_clip_parity(name="ViT-B/32"):
    from pixray_tpu.models.perceptor import _find_checkpoint

    ckpt = _find_checkpoint(name)
    if ckpt is None:
        _skip(f"clip_parity:{name}", "no checkpoint on disk")
        return True
    try:
        import torch
    except ImportError:
        _skip(f"clip_parity:{name}", "torch unavailable")
        return True

    # torch reference side: the OpenAI archive is TorchScript — it IS the
    # reference implementation
    try:
        ts = torch.jit.load(ckpt, map_location="cpu").float().eval()
    except Exception as e:
        _skip(f"clip_parity:{name}", f"checkpoint is not TorchScript ({e}); "
              "structural converter tests still apply")
        return True

    from pixray_tpu.models.clip.tokenizer import get_tokenizer, tokenize
    from pixray_tpu.models.perceptor import Perceptor

    if not _record("tokenizer_is_checkpoint_exact", not get_tokenizer().degraded):
        return False

    p = Perceptor(name)
    res = p.input_resolution
    imgs = _fixed_images(4, res)

    # image side: both implementations get the SAME standardized pixels
    mean = np.asarray(p.mean).reshape(1, 1, 1, 3)
    std = np.asarray(p.std).reshape(1, 1, 1, 3)
    pre = (imgs - mean) / std
    with torch.no_grad():
        ref_img = ts.encode_image(
            torch.from_numpy(pre.transpose(0, 3, 1, 2))
        ).numpy()
    ours_img = np.asarray(p.encode_image(pre, apply_preprocess=False))
    # ours is L2-normalized; normalize the reference before comparing direction
    ref_img = ref_img / np.linalg.norm(ref_img, axis=-1, keepdims=True)
    cos_img = np.sum(ref_img * ours_img, axis=-1)

    toks = tokenize(FIXED_TEXTS)
    with torch.no_grad():
        ref_txt = ts.encode_text(torch.from_numpy(np.asarray(toks))).numpy()
    ours_txt = np.asarray(p.encode_text(FIXED_TEXTS))
    cos_txt = np.sum(
        ref_txt / np.linalg.norm(ref_txt, axis=-1, keepdims=True)
        * ours_txt / np.linalg.norm(ours_txt, axis=-1, keepdims=True),
        axis=-1,
    )
    ok = bool(cos_img.min() >= 0.999 and cos_txt.min() >= 0.999)
    return _record(
        f"clip_parity:{name}",
        ok,
        image_cos_min=float(cos_img.min()),
        text_cos_min=float(cos_txt.min()),
    )


def check_vqgan_decode(name="imagenet_f16_16384"):
    from pixray_tpu.drawers.vqgan import VQGAN_CHECKPOINT_TABLE

    ckpt_path = VQGAN_CHECKPOINT_TABLE.get(name, f"models/vqgan_{name}.ckpt")
    models_dir = os.environ.get("PIXRAY_TPU_MODELS", "")
    if not os.path.exists(ckpt_path) and models_dir:
        alt = os.path.join(models_dir, os.path.basename(ckpt_path))
        if os.path.exists(alt):
            ckpt_path = alt
    if not os.path.exists(ckpt_path):
        _skip(f"vqgan_decode:{name}", "no checkpoint on disk")
        return True

    import jax.numpy as jnp
    import torch

    from pixray_tpu.models.vqgan import VQGAN, VQGAN_CONFIGS, convert_taming_vqgan

    config = VQGAN_CONFIGS[name]
    model = VQGAN(config)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = convert_taming_vqgan(sd, config)
    rng = np.random.default_rng(0)
    grid = 4
    codes = jnp.asarray(
        rng.standard_normal((1, grid, grid, config.embed_dim)), jnp.float32
    )
    out = np.asarray(
        model.apply(variables, codes, method=model.decode_from_continuous)
    )
    finite = bool(np.isfinite(out).all())
    return _record(
        f"vqgan_decode:{name}",
        finite,
        out_shape=list(out.shape),
        out_mean=float(out.mean()),
        out_std=float(out.std()),
    )


def check_convergence(clip_model="ViT-B/32", iters=50, threshold=0.86):
    """50-iter pixel run on real weights: the CLIP loss must fall below the
    recorded threshold (random-weight runs hover near the ~0.95 chance level;
    real CLIP on this prompt descends well under it)."""
    from pixray_tpu.models.perceptor import _find_checkpoint

    if _find_checkpoint(clip_model) is None:
        _skip("convergence", f"no {clip_model} checkpoint on disk")
        return True

    from pixray_tpu.config import apply_settings
    from pixray_tpu.engine.core import Engine

    settings = apply_settings(
        dict(
            drawer="pixel",
            prompts="a bright red apple on a white table",
            clip_models=clip_model,
            size=[160, 90],
            num_cuts=16,
            batches=1,
            iterations=iters,
            save_every=100000,
            display_every=100000,
            init_noise=None,
            vector_prompts="none",
            seed=1,
            outdir="",
            save_intermediates=False,
            learning_rate_drops=[],
        ),
        apply_side_effects=False,
    )
    e = Engine(settings)
    losses = []
    for it in range(iters):
        e.train(it)
        losses.append(float(np.asarray(e.last_loss_values).sum()))
    final = float(np.mean(losses[-5:]))
    ok = final < threshold and losses[-1] < losses[0]
    return _record(
        "convergence",
        ok,
        first_loss=losses[0],
        final_loss=final,
        threshold=threshold,
        iterations=iters,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default="WEIGHTS_PARITY.json")
    ap.add_argument("--clip", default="ViT-B/32")
    ap.add_argument("--vqgan", default="imagenet_f16_16384")
    args = ap.parse_args()

    ok = True
    ok &= check_clip_parity(args.clip)
    ok &= check_vqgan_decode(args.vqgan)
    ok &= check_convergence(args.clip)

    REPORT["ok"] = bool(ok)
    with open(args.report, "w") as f:
        json.dump(REPORT, f, indent=2)
    print(f"report -> {args.report}  ok={ok}")
    if not REPORT["checks"]:
        print("NOTE: no checkpoints found — nothing validated. Place weights "
              "under models/ or set $PIXRAY_TPU_MODELS.")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
