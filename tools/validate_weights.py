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


def _tree_shapes(tree, prefix=""):
    """Flatten a pytree to {path: shape} for exact structural comparison."""
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        out[key] = tuple(leaf.shape)
    return out


def _audit_family(name, converted, expected_tree, sd):
    """Converted variables must match the module's init tree exactly, and the
    converter must have consumed every signature key."""
    got = _tree_shapes(converted)
    want = _tree_shapes(expected_tree)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    wrong = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    unread = sd.unread() if hasattr(sd, "unread") else []
    ok = not (missing or extra or wrong or unread)
    info = {"params": len(want)}
    if missing:
        info["missing"] = missing[:8]
    if extra:
        info["extra"] = extra[:8]
    if wrong:
        info["wrong_shape"] = [(k, got[k], want[k]) for k in wrong[:8]]
    if unread:
        info["unconsumed_ckpt_keys"] = unread[:8]
    return _record(f"audit:{name}", ok, **info)


def audit_converters():
    """Asset-free converter audit: every checkpoint family's converter is run
    against a spec'd synthetic signature (models/signatures.py) at REAL
    configuration scale and must reproduce the model's init tree exactly.
    Exits nonzero if any converter would mis-map a real checkpoint."""
    import jax
    import jax.numpy as jnp

    from pixray_tpu.models import signatures as S

    ok = True

    # --- CLIP (OpenAI ViT + ModifiedResNet) and SLIP -----------------------
    from pixray_tpu.models.clip.configs import CLIP_CONFIGS, SLIP_CONFIGS
    from pixray_tpu.models.clip.convert import convert_openai_clip, convert_slip_clip
    from pixray_tpu.models.clip.model import CLIP

    def clip_init_tree(cfg):
        model = CLIP(cfg, dtype=jnp.float32)
        return jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )

    for name in ("ViT-B/32", "ViT-B/16", "RN50"):
        cfg = CLIP_CONFIGS[name]
        sd = S.openai_clip_signature(cfg)
        ok &= _audit_family(
            f"clip:{name}", convert_openai_clip(sd, cfg), clip_init_tree(cfg), sd
        )
    for name in ("SLIP_VITS16",):
        cfg = SLIP_CONFIGS[name]
        sd = S.slip_clip_signature(cfg)
        ok &= _audit_family(
            f"slip:{name}", convert_slip_clip(sd, cfg), clip_init_tree(cfg), sd
        )

    # --- VQGAN (standard + Gumbel) ----------------------------------------
    from pixray_tpu.models.vqgan import VQGAN, VQGAN_CONFIGS, convert_taming_vqgan

    for name in ("imagenet_f16_16384", "openimages_f16_8192"):
        cfg = VQGAN_CONFIGS[name]
        sd = S.taming_vqgan_signature(cfg)
        model = VQGAN(cfg, dtype=jnp.float32)
        expected = jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.resolution, cfg.resolution, 3)),
        )
        ok &= _audit_family(
            f"vqgan:{name}", convert_taming_vqgan(sd, cfg), expected, sd
        )

    # --- ESRGAN (RRDBNet) + a tiny real forward ----------------------------
    from pixray_tpu.models.esrgan import RRDBNet, convert_rrdbnet

    sd = S.rrdbnet_signature()
    model = RRDBNet()
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))
    )
    variables = convert_rrdbnet(sd)
    ok &= _audit_family("esrgan:rrdbnet_x4", variables, expected, sd)
    out = np.asarray(model.apply(variables, jnp.zeros((1, 8, 8, 3))))
    ok &= _record(
        "audit:esrgan_forward",
        bool(np.isfinite(out).all() and out.shape == (1, 32, 32, 3)),
        out_shape=list(out.shape),
    )

    # --- VGG16 (torchvision features) + forward ----------------------------
    from pixray_tpu.models.vgg import (
        convert_torchvision_vgg16, init_vgg16_params, vgg16_features,
    )

    sd = S.vgg16_signature()
    params = convert_torchvision_vgg16(sd)
    expected = jax.eval_shape(lambda: init_vgg16_params(jax.random.PRNGKey(0)))
    ok &= _audit_family("vgg16:features", params, expected, sd)
    feats = vgg16_features(params, jnp.zeros((1, 64, 64, 3)))
    ok &= _record(
        "audit:vgg16_forward",
        bool(all(np.isfinite(np.asarray(f)).all() for f in feats)),
        n_feature_maps=len(feats),
    )

    # --- aesthetic head + resmem: exercise the real torch-file load path ---
    import tempfile

    import torch

    with tempfile.TemporaryDirectory() as td:
        old = os.environ.get("PIXRAY_TPU_MODELS")
        os.environ["PIXRAY_TPU_MODELS"] = td
        try:
            torch.save(
                {"weight": torch.zeros(1, 512) + 0.5, "bias": torch.zeros(1) + 0.25},
                os.path.join(td, "ava_vit_b_16_linear.pth"),
            )
            from types import SimpleNamespace

            from pixray_tpu.losses.aesthetic import AestheticLoss

            al = AestheticLoss(SimpleNamespace())
            ok &= _record(
                "audit:aesthetic_head",
                bool(
                    al.weight.shape == (1, 512)
                    and float(al.weight[0, 0]) == 0.5
                    and float(al.bias[0]) == 0.25
                ),
                weight_shape=list(al.weight.shape),
            )

            from pixray_tpu.losses.resmem import ALEXNET_SPEC, ResmemLoss

            rm_sd = {}
            cin = 3
            for i, (cout, k, _s, _p) in enumerate(ALEXNET_SPEC):
                rm_sd[f"features.{i}.weight"] = torch.zeros(cout, cin, k, k) + 0.1
                rm_sd[f"features.{i}.bias"] = torch.zeros(cout)
                cin = cout
            torch.save(rm_sd, os.path.join(td, "resmem_model.pt"))
            rl = ResmemLoss(SimpleNamespace())
            mapped = sum(
                abs(float(np.asarray(rl.alex_params[f"conv{i}"]["kernel"]).flatten()[0]) - 0.1) < 1e-6
                for i in range(len(ALEXNET_SPEC))
            )
            ok &= _record(
                "audit:resmem_alexnet",
                mapped == len(ALEXNET_SPEC),
                mapped=int(mapped),
                expected=len(ALEXNET_SPEC),
            )
        finally:
            if old is None:
                os.environ.pop("PIXRAY_TPU_MODELS", None)
            else:
                os.environ["PIXRAY_TPU_MODELS"] = old

    # --- vdiff: spec-derived signatures for every reference model name -----
    from pixray_tpu.models.vdiff_upstream import (
        PUBLISHED_PARAM_COUNTS_M, UPSTREAM_SPECS, expected_state_shapes,
    )

    for name, spec in UPSTREAM_SPECS.items():
        try:
            shapes = expected_state_shapes(spec)
            total = sum(int(np.prod(s)) for s in shapes.values())
            want = PUBLISHED_PARAM_COUNTS_M.get(name)
            close = want is None or abs(total - want * 1e6) / (want * 1e6) < 0.01
            ok &= _record(
                f"audit:vdiff:{name}", close,
                params=total, published_M=want,
            )
        except Exception as e:
            ok &= _record(f"audit:vdiff:{name}", False, error=str(e)[:200])

    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default="WEIGHTS_PARITY.json")
    ap.add_argument("--clip", default="ViT-B/32")
    ap.add_argument("--vqgan", default="imagenet_f16_16384")
    ap.add_argument("--no-audit", action="store_true",
                    help="skip the asset-free converter audit")
    args = ap.parse_args()

    ok = True
    if not args.no_audit:
        ok &= audit_converters()
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
