"""Style loss: STROTSS relaxed-EMD style transfer against a style image.

Full JAX re-design of /root/reference/Losses/StyleLoss.py:
- VGG16 hypercolumn features (models/vgg.py);
- Laplacian pyramid fold/unfold (jax.image.resize based);
- style hypercolumn sampling (5×1000 random points);
- content structure loss (pairwise cosine self-distance matrix match);
- relaxed earth-mover's distance (REMD) + moment matching + palette REMD;
- multi-scale loop over power-of-two downscalings (min side ≥ 33);
- skip/every scheduling via lax.cond so the (expensive) computation is actually
  skipped inside jit rather than masked.

Static-shape adaptations (jit requirements): the reference's random-stride index
grids have offset-dependent length; we use a fixed count with clipped strided
indices, and shuffles use jax.random.permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pixray_tpu.losses.base import LossInterface
from pixray_tpu.models.vgg import load_vgg16_params, vgg16_features

FEAT_MAX = 3 + 2 * 64 + 2 * 128 + 3 * 256 + 2 * 512  # hypercolumn channels


def _resize(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]), method="bilinear")


def laplacian(x):
    h, w = x.shape[1], x.shape[2]
    return x - _resize(_resize(x, (h // 2, w // 2)), (h, w))


def make_laplace_pyramid(x, levels):
    pyramid = []
    current = x
    for _ in range(levels):
        pyramid.append(laplacian(current))
        h, w = current.shape[1], current.shape[2]
        current = _resize(current, (max(h // 2, 1), max(w // 2, 1)))
    pyramid.append(current)
    return pyramid


def fold_laplace_pyramid(pyramid):
    current = pyramid[-1]
    for i in range(len(pyramid) - 2, -1, -1):
        current = pyramid[i] + _resize(current, (pyramid[i].shape[1], pyramid[i].shape[2]))
    return current


def _gather_hypercolumn(feats, xx, yy):
    """Bilinear-sample each captured feature map at (xx, yy) points given in
    feat[0] coordinates; concat along channels → (P, C_total).  Mirrors
    spatial_feature_extract (StyleLoss.py:168-220) including the per-downscale
    coordinate halving."""
    cols = []
    cur_xx, cur_yy = xx, yy
    prev_h = feats[0].shape[1]
    for i, f in enumerate(feats):
        if i > 0 and f.shape[1] < prev_h:
            cur_xx = cur_xx / 2.0
            cur_yy = cur_yy / 2.0
        prev_h = f.shape[1]
        h, w = f.shape[1], f.shape[2]
        x0 = jnp.floor(cur_xx)
        y0 = jnp.floor(cur_yy)
        xr = (cur_xx - x0)[:, None]
        yr = (cur_yy - y0)[:, None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, h - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, w - 1)
        fm = f[0]  # (H, W, C)
        v = (
            fm[x0i, y0i] * (1 - xr) * (1 - yr)
            + fm[x0i, y1i] * (1 - xr) * yr
            + fm[x1i, y0i] * xr * (1 - yr)
            + fm[x1i, y1i] * xr * yr
        )
        cols.append(v)
    cols.append(xx[:, None])
    cols.append(yy[:, None])
    return jnp.concatenate(cols, axis=1)  # (P, C_total+2)


def pairwise_cos_dist(x, y):
    xn = jnp.linalg.norm(x, axis=1, keepdims=True)
    yn = jnp.linalg.norm(y, axis=1, keepdims=True)
    return 1.0 - (x @ y.T) / xn / yn.T


def pairwise_l2_dist(x, y):
    d = (
        jnp.sum(x**2, axis=1)[:, None]
        + jnp.sum(y**2, axis=1)[None, :]
        - 2.0 * x @ y.T
    )
    return jnp.sqrt(jnp.clip(d, 1e-5, 1e5) / x.shape[1])


def content_loss(feat_result, feat_content):
    x = feat_result[:, :-2]
    y = feat_content[:, :-2]
    mx = pairwise_cos_dist(x, x)
    my = pairwise_cos_dist(y, y)
    return jnp.mean(jnp.abs(mx - my))


_YUV = jnp.asarray(
    [[0.577350, 0.577350, 0.577350],
     [-0.577350, 0.788675, -0.211325],
     [-0.577350, -0.211325, 0.788675]]
)


def remd_loss(x, y):
    """Relaxed earth mover's distance (StyleLoss.py:268-288)."""
    if x.shape[1] == 3:
        x = x @ _YUV.T
        y = y @ _YUV.T
        cx = pairwise_cos_dist(x, y) + pairwise_l2_dist(x, y)
    else:
        cx = pairwise_cos_dist(x, y)
    m1 = jnp.min(cx, axis=1)
    m2 = jnp.min(cx, axis=0)
    return jnp.maximum(jnp.mean(m1), jnp.mean(m2))


def moment_loss(x, y):
    mu_x = jnp.mean(x, axis=0, keepdims=True)
    mu_y = jnp.mean(y, axis=0, keepdims=True)
    loss = jnp.mean(jnp.abs(mu_x - mu_y))
    xc = x - mu_x
    yc = y - mu_y
    x_cov = xc.T @ xc / (x.shape[0] - 1)
    y_cov = yc.T @ yc / (y.shape[0] - 1)
    return loss + jnp.mean(jnp.abs(x_cov - y_cov))


def _strided_indices(h, w, rng_offsets):
    """Static-count strided grid (reference sample_indices, StyleLoss.py:152-166)."""
    const = 128**2
    big = h * w
    stride_x = max(int(np.floor(np.sqrt(big // const))), 1)
    stride_y = max(int(np.ceil(np.sqrt(big // const))), 1)
    nx = (h + stride_x - 1) // stride_x
    ny = (w + stride_y - 1) // stride_y
    off_x = rng_offsets[0] % stride_x
    off_y = rng_offsets[1] % stride_y
    xs = jnp.clip(off_x + stride_x * jnp.arange(nx), 0, h - 1)
    ys = jnp.clip(off_y + stride_y * jnp.arange(ny), 0, w - 1)
    xx, yy = jnp.meshgrid(xs, ys, indexing="ij")
    return xx.reshape(-1).astype(jnp.float32), yy.reshape(-1).astype(jnp.float32)


def calculate_loss(feat_result, feat_content, feat_style, xx, yy, content_weight, moment_weight=1.0):
    n = min(1024, xx.shape[0])
    sr = _gather_hypercolumn(feat_result, xx[:n], yy[:n])
    sc = _gather_hypercolumn(feat_content, xx[:n], yy[:n])
    loss_c = content_loss(sr, sc)

    loss_remd = remd_loss(sr[:, :FEAT_MAX], feat_style[:, :FEAT_MAX])
    loss_moment = moment_loss(sr[:, :-2], feat_style)
    loss_moment += (1.0 / max(content_weight, 1.0)) * remd_loss(sr[:, :3], feat_style[:, :3])

    loss_style = loss_remd + moment_weight * loss_moment
    style_weight = 1.0 + moment_weight
    return (content_weight * loss_c + loss_style) / (content_weight + style_weight)


def sample_style_hypercolumn(key, vgg_params, style, space, samps=1000, rounds=5):
    """5 rounds of 1000 random hypercolumn samples of the style image
    (StyleLoss.py:49-80, 359-363), gradients stopped."""
    feats = vgg16_features(vgg_params, style, space)
    h, w = style.shape[1], style.shape[2]
    chunks = []
    for r in range(rounds):
        k = jax.random.fold_in(key, r)
        kx, ky = jax.random.split(k)
        xx = jax.random.uniform(kx, (samps,)) * (h - 1)
        yy = jax.random.uniform(ky, (samps,)) * (w - 1)
        chunks.append(_gather_hypercolumn(feats, xx, yy)[:, :-2])
    return jax.lax.stop_gradient(jnp.concatenate(chunks, axis=0))


def strotss_loss(out, style, content_weight, vgg_params, key, space="uniform"):
    """Full multi-scale STROTSS loss (StyleLoss.py:385-425).

    out, style: (1, H, W, 3) in [-1, 1]-ish space (we feed [0,1] canvases; the
    extractor's non-vgg branch rescales (x+1)/2 → we pre-map to match reference
    conventions at the call site)."""
    h, w = out.shape[1], out.shape[2]
    scales = []
    for scale in range(10):
        divisor = 2**scale
        if min(h, w) // divisor >= 33:
            scales.insert(0, divisor)

    total = jnp.zeros(())
    lr = 2e-3
    result = None
    for si, scale in enumerate(scales):
        content = _resize(out, (h // scale, w // scale))
        style_s = _resize(style, (h // scale, w // scale))

        if si == 0:
            result = laplacian(content) + jnp.mean(style_s, axis=(1, 2), keepdims=True)
        elif si == len(scales) - 1:
            result = _resize(result, (content.shape[1], content.shape[2]))
            lr = 1.0
        else:
            result = _resize(result, (content.shape[1], content.shape[2])) + laplacian(content)

        k_scale = jax.random.fold_in(key, si)
        feat_content = vgg16_features(vgg_params, content, space)
        feat_style = sample_style_hypercolumn(k_scale, vgg_params, style_s, space)
        pyramid = make_laplace_pyramid(result, 5)
        stylized = fold_laplace_pyramid(pyramid)
        feat_result = vgg16_features(vgg_params, stylized, space)

        off = jax.random.randint(jax.random.fold_in(k_scale, 99), (2,), 0, 2**30)
        xx, yy = _strided_indices(content.shape[1], content.shape[2], off)
        for it in range(3):
            if it != 0:
                perm = jax.random.permutation(jax.random.fold_in(k_scale, it), xx.shape[0])
                xx, yy = xx[perm], yy[jax.random.permutation(jax.random.fold_in(k_scale, it + 50), yy.shape[0])]
            total += calculate_loss(feat_result, feat_content, feat_style, xx, yy, content_weight) * lr

        content_weight /= 2.0
    return total


class StyleLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--style_file", type=str, default="", dest="style_file")
        parser.add_argument("--styleloss_content_weight", type=float, default=32, dest="styleloss_content_weight")
        parser.add_argument("--styleloss_ospace", type=str, default="uniform", dest="styleloss_ospace")
        parser.add_argument("--styleloss_skip", type=int, default=100, dest="styleloss_skip")
        parser.add_argument("--styleloss_every", type=int, default=1, dest="styleloss_every")
        return parser

    def __init__(self, settings=None):
        super().__init__(settings)
        self.params = {"vgg": load_vgg16_params()}
        self.style_image = None
        if settings.style_file:
            from pixray_tpu.io.images import open_images

            self.style_pil = open_images(settings.style_file)[0].convert("RGB")
        else:
            self.style_pil = None

    def _style_tensor(self, out):
        from PIL import Image

        import numpy as np

        h, w = out.shape[0], out.shape[1]
        if self.style_image is None or self.style_image.shape[1:3] != (h, w):
            resized = self.style_pil.resize((w, h), Image.BICUBIC)
            self.style_image = jnp.asarray(np.asarray(resized, np.float32) / 255.0)[None]
        return self.style_image

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        vgg_params = (params or self.params)["vgg"]
        if self.style_pil is None:
            return jnp.zeros(())
        style = self._style_tensor(out)
        it = globals["cur_iteration"]
        # the reference feeds [0,1] canvases straight into the 'uniform'-space
        # extractor (which maps (x+1)/2) — keep identical numerics, no remap
        out_b = out[None]
        style_b = style

        def compute(_):
            return strotss_loss(
                out_b, style_b, args.styleloss_content_weight,
                vgg_params, key, space=args.styleloss_ospace,
            )

        active = jnp.logical_and(
            it >= args.styleloss_skip, (it % args.styleloss_every) == 0
        )
        return jax.lax.cond(active, compute, lambda _: jnp.zeros(()), operand=None)


def _resize_long_edge(pil, trg):
    """pil_resize_long_edge_to (StyleLoss.py:98-102)."""
    from PIL import Image

    short_w = pil.width < pil.height
    ar_resized_long = (trg / pil.height) if short_w else (trg / pil.width)
    return pil.resize(
        (int(pil.width * ar_resized_long), int(pil.height * ar_resized_long)),
        Image.BICUBIC,
    )


def run_strotss(content_pil, style_pil, content_weight=16.0, space="uniform",
                steps=150, seed=0, progress=print):
    """Standalone STROTSS style transfer: optimize an image against the full
    multi-scale loss.  Returns a (H, W, 3) float array in [0, 1].

    The reference ships ``python -m Losses.StyleLoss content style``
    (StyleLoss.py:431-456) — which calls a ``strotss`` function that does not
    exist in that file (vestigial upstream entry; it NameErrors).  This is the
    working equivalent: Adam on a sigmoid-parameterized canvas, one jitted
    value_and_grad of strotss_loss per step.
    """
    import optax

    content = jnp.asarray(np.asarray(content_pil, np.float32) / 255.0)[None]
    style = jnp.asarray(
        np.asarray(
            style_pil.resize((content.shape[2], content.shape[1])), np.float32
        ) / 255.0
    )[None]
    vgg_params = load_vgg16_params()

    img0 = jnp.clip(content, 1e-3, 1 - 1e-3)
    z = jnp.log(img0 / (1 - img0))  # sigmoid logits, init = content
    opt = optax.adam(0.02)
    opt_state = opt.init(z)

    @jax.jit
    def step_fn(z, opt_state, key):
        def loss_fn(z):
            return strotss_loss(
                jax.nn.sigmoid(z), style, content_weight, vgg_params, key, space
            )

        loss, g = jax.value_and_grad(loss_fn)(z)
        updates, opt_state = opt.update(g, opt_state, z)
        return optax.apply_updates(z, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    for it in range(steps):
        key, k = jax.random.split(key)
        z, opt_state, loss = step_fn(z, opt_state, k)
        if it % 25 == 0 or it == steps - 1:
            progress(f"strotss step {it}: loss {float(loss):.4f}")
    return np.asarray(jax.nn.sigmoid(z[0]))


def main(argv=None):
    """CLI parity with /root/reference/Losses/StyleLoss.py:431-456."""
    import argparse

    from PIL import Image

    parser = argparse.ArgumentParser(description="STROTSS style transfer")
    parser.add_argument("content", type=str)
    parser.add_argument("style", type=str)
    parser.add_argument("--weight", type=float, default=1.0)
    parser.add_argument("--output", type=str, default="strotss.png")
    parser.add_argument("--device", type=str, default=None,
                        help="accepted for reference-script compatibility (JAX places automatically)")
    parser.add_argument("--ospace", type=str, default="uniform", choices=["uniform", "vgg"])
    parser.add_argument("--resize_to", type=int, default=512)
    parser.add_argument("--steps", type=int, default=150)
    args = parser.parse_args(argv)

    if args.resize_to < 2**8:
        print("Resulution too low.")  # sic — reference message, StyleLoss.py:445
        raise SystemExit(1)

    content_pil = Image.open(args.content).convert("RGB")
    style_pil = Image.open(args.style).convert("RGB")
    result = run_strotss(
        _resize_long_edge(content_pil, args.resize_to),
        _resize_long_edge(style_pil, args.resize_to),
        content_weight=args.weight * 16.0,
        space=args.ospace,
        steps=args.steps,
    )
    Image.fromarray((result * 255).astype(np.uint8)).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
