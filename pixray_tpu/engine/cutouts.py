"""Cutout/augmentation pipeline — the hot-path image sampler feeding the perceptors.

Capability parity with MakeCutouts (/root/reference/pixray.py:400-511):

- avg+max adaptive pooling of the canvas to the perceptor resolution;
- aspect-ratio re-widening of the pooled square;
- a 60% "zoom" branch (random perspective p=0.7 ∘ random resized crop) warped with
  reflection/border padding alternating by iteration parity (pixray.py:1250-1253);
- a 40% "wide" branch (fixed-scale random affine ∘ center crop ∘ padded random
  perspective p=0.7) filled with a per-iteration random gray (pixray.py:1255-1258);
- per-cutout hue/saturation jitter (p=0.8) on the live path only;
- additive uniform-scaled gaussian noise (noise_fac=0.1);
- transform reuse: spot cutouts and image-prompt cutouts are produced with the SAME
  sampled geometry as the main cutouts of the step (the reference's transform cache,
  pixray.py:480-491), so image prompts see identical warps.

TPU-first design: every augmentation is a composed 3x3 matrix so each cutout is ONE
bilinear gather from the pooled working canvas; the whole bank of N cutouts is a
single vmapped gather that XLA fuses with the downstream perceptor normalization.
All randomness is explicit `jax.random` key threading — the pipeline is a pure
function, jit/vmap/shard_map-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import os

from pixray_tpu.ops import warp as W
from pixray_tpu.ops.color import random_color_jitter, random_color_jitter_planes
from pixray_tpu.ops.pool import adaptive_avg_pool, adaptive_max_pool
from pixray_tpu.ops.warp_batch import warp_batch as _xla_warp_batch
from pixray_tpu.ops.warp_batch import warp_batch_modes as _xla_warp_batch_modes
from pixray_tpu.ops.warp_batch import warp_batch_separable


def warp_batch(work, matrices, cut_size, **kwargs):
    """Warp backend: the fused Pallas kernel (ops/pallas_warp.py) on accelerators,
    the XLA path on CPU.  PIXRAY_TPU_PALLAS=0 forces XLA, =1 forces Pallas.

    The Pallas kernel is both ~2.4x faster (195→82 ms/step at 64 cutouts on v5e)
    AND the only correct warp on the current TPU backend: tools/crosscheck showed
    the XLA dual-2D-index bilinear gather mis-executes there (Pallas matches the
    CPU ground truth to 4e-3; the XLA gather is off by up to 0.93).

    Dispatch uses ``jax.lax.platform_dependent``, which resolves against the
    platform the computation is actually LOWERED for — correct under explicit
    ``jax.device_put``/``shard_map`` placement, where sniffing the process-global
    default device would lie.  Only the selected branch is lowered, so the Pallas
    kernel never has to compile on CPU."""
    mode = os.environ.get("PIXRAY_TPU_PALLAS", "auto")
    if mode == "0":
        return _xla_warp_batch(work, matrices, cut_size, **kwargs)
    from pixray_tpu.ops.pallas_warp import pallas_warp_batch

    if mode == "1":
        return pallas_warp_batch(work, matrices, cut_size, **kwargs)
    # both branches must produce identical avals; the XLA path promotes low
    # precision internally, so pin the output to the input dtype
    return jax.lax.platform_dependent(
        work,
        matrices,
        cpu=lambda w, m: _xla_warp_batch(w, m, cut_size, **kwargs).astype(w.dtype),
        default=lambda w, m: pallas_warp_batch(w, m, cut_size, **kwargs).astype(w.dtype),
    )

def warp_batch_modes(work, matrices, modes, cut_size, **kwargs):
    """Mixed-mode bank warp backend (ONE kernel launch for the whole cutout
    bank — zoom reflection/border cuts and wide fill cuts together).  Same
    Pallas/XLA dispatch policy as warp_batch."""
    mode_env = os.environ.get("PIXRAY_TPU_PALLAS", "auto")
    if mode_env == "0":
        return _xla_warp_batch_modes(work, matrices, modes, cut_size, **kwargs)
    from pixray_tpu.ops.pallas_warp import pallas_warp_batch_modes

    if mode_env == "1":
        return pallas_warp_batch_modes(work, matrices, modes, cut_size, **kwargs)
    return jax.lax.platform_dependent(
        work,
        matrices,
        modes,
        cpu=lambda w, m, md: _xla_warp_batch_modes(w, m, md, cut_size, **kwargs).astype(w.dtype),
        default=lambda w, m, md: pallas_warp_batch_modes(w, m, md, cut_size, **kwargs).astype(w.dtype),
    )


NOISE_FAC = 0.1
ZOOM_FRACTION = 0.6
PERSP_P = 0.7  # per-cut perspective probability (ref pixray.py:404-409 K.RandomPerspective p=0.7)


def split_persp_enabled() -> bool:
    """Fixed-count perspective split (default).

    The reference applies random perspective to each cut with independent
    probability p=0.7; the non-perspective cuts are AXIS-ALIGNED and their
    warp factorizes into two tiny matmuls (warp_batch_separable) instead of
    the dense hat contraction — the profiled top cost of the step.  Fixing the
    perspective count at its expectation round(p*n) per branch (the same kind
    of determinization as the existing 60/40 zoom/wide split) makes the split
    static so the separable cuts skip the Pallas kernel entirely: each cut's
    marginal transform distribution is unchanged; only the Binomial count
    variance across the bank is removed.  PIXRAY_TPU_SPLIT_PERSP=0 restores
    per-cut Bernoulli sampling (exact kornia semantics)."""
    return os.environ.get("PIXRAY_TPU_SPLIT_PERSP", "1") == "1"


def persp_split(n: int) -> tuple[int, int]:
    """(n_perspective, n_separable) for a branch of ``n`` cuts."""
    n_p = int(round(PERSP_P * n))
    return n_p, n - n_p


def square_work_enabled() -> bool:
    """Warp directly from the pooled SQUARE canvas (default).

    The reference re-widens the pooled square back to the canvas aspect before
    cutting (pixray.py:445-463) — a bilinear UPSAMPLE that adds no information
    but inflates the warp's hat-matmul contraction from (cut, cut) to
    (cut, cut*aspect): 1.78x the FLOPs at the 16:9 flagship.  Composing the
    aspect re-widening into the cutout homographies samples the identical
    geometry straight from the pooled square (one bilinear resample instead of
    two — strictly less filtering) and shrinks the profiled per-step bottleneck
    (warp fwd+bwd) by the aspect ratio.  PIXRAY_TPU_SQUARE_WORK=0 restores the
    reference-shaped widened canvas for A/B audits.
    """
    return os.environ.get("PIXRAY_TPU_SQUARE_WORK", "1") == "1"


def work_canvas_shape(cut_size: int, aspect: float) -> tuple[int, int]:
    """Shape of the (virtual) aspect-re-widened working canvas.

    Cutout TRANSFORMS are always sampled in this coordinate space (reference
    geometry + unchanged PRNG schedule); under square-work the canvas itself
    stays (cut, cut) and the work→pooled rescale is folded into the matrices.
    """
    if aspect == 1.0:
        return (cut_size, cut_size)
    if aspect > 1.0:
        return (cut_size, int(round(cut_size * aspect)))
    return (int(round(cut_size / aspect)), cut_size)


def pooled_canvas_shape(cut_size: int, aspect: float) -> tuple[int, int]:
    """Shape of the canvas render_cutouts actually gathers from."""
    if square_work_enabled():
        return (cut_size, cut_size)
    return work_canvas_shape(cut_size, aspect)


def work_from_pooled_matrix(cut_size: int, aspect: float):
    """(3,3) affine mapping pooled-square coords → virtual work-canvas coords.

    jax.image.resize('bilinear') uses half-pixel centers, so the widened canvas
    relates to the pooled square by  x_w = (x_p + 0.5) * (ww / pw) - 0.5  per
    axis; composing a cutout transform m (work→cut) with the INVERSE of this
    map's inverse — i.e. m @ S with S = pooled→work — yields the pooled→cut
    matrix whose warp samples the same geometry from the square canvas."""
    wh, ww = work_canvas_shape(cut_size, aspect)
    sx = ww / cut_size
    sy = wh / cut_size
    return jnp.asarray(
        [[sx, 0.0, 0.5 * sx - 0.5], [0.0, sy, 0.5 * sy - 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


def pool_to_work(image, cut_size: int, aspect: float):
    """(H, W, C) canvas -> pooled working canvas.

    Reference pools per cutout with identical (deterministic) results
    (pixray.py:461-463); pooling once is the same computation hoisted out.
    Under square-work (default) the pooled square IS the working canvas; the
    reference's aspect re-widening upsample lives in the transform matrices
    instead (work_from_pooled_matrix).
    """
    pooled = 0.5 * (
        adaptive_avg_pool(image, cut_size, cut_size)
        + adaptive_max_pool(image, cut_size, cut_size)
    )
    if square_work_enabled():
        return pooled
    wh, ww = work_canvas_shape(cut_size, aspect)
    if (wh, ww) != (cut_size, cut_size):
        pooled = jax.image.resize(pooled, (wh, ww, pooled.shape[-1]), method="bilinear")
    return pooled


def _wide_affine_params(aspect: float):
    """Aspect-dependent affine for the wide branch (pixray.py:419-431)."""
    if aspect == 1.0:
        n_s = 0.95
        n_t = (1 - n_s) / 2
        return (n_t, n_t), (n_s, n_s)
    if aspect > 1.0:
        n_s = 1 / aspect
        n_t = (1 - n_s) / 2
        return (0.0, n_t), (0.9 * n_s, n_s)
    n_s = aspect
    n_t = (1 - n_s) / 2
    return (n_t, 0.0), (0.9 * n_s, n_s)


def split_counts(cutn: int) -> tuple[int, int]:
    n_zoom = int(ZOOM_FRACTION * cutn)
    return n_zoom, cutn - n_zoom


def sample_cut_transforms(key, cut_size: int, cutn: int, aspect: float):
    """Sample the per-step bank of composed cutout homographies.

    Returns (n_zoom, 3, 3) and (n_wide, 3, 3) src→dst matrices over the working
    canvas. These are shared by main/spot/image-prompt cutouts within a step.
    """
    wh, ww = work_canvas_shape(cut_size, aspect)
    n_zoom, n_wide = split_counts(cutn)
    split = split_persp_enabled()

    def one_zoom(k, persp):
        # same key schedule in both modes: a slot's crop is identical whether
        # its perspective comes from Bernoulli(kp) or the fixed-count split
        k1, k2, kp = jax.random.split(k, 3)
        p = W.random_perspective(k1, wh, ww, 0.40)
        if split:
            m_persp = p if persp else jnp.eye(3, dtype=p.dtype)
        else:
            m_persp = W.maybe(kp, PERSP_P, p)
        m_crop = W.random_resized_crop(k2, wh, ww, cut_size, scale=(0.25, 0.95), ratio=(0.85, 1.2))
        return W.mm3(m_crop, m_persp)

    translate, scale_range = _wide_affine_params(aspect)

    def one_wide(k, persp):
        k1, k2, kp = jax.random.split(k, 3)
        m_aff = W.random_affine(k1, wh, ww, translate, scale_range)
        m_center = W.center_crop_transform(wh, ww, cut_size)
        p = W.random_perspective(k2, cut_size, cut_size, 0.20)
        if split:
            m_persp = p if persp else jnp.eye(3, dtype=p.dtype)
        else:
            m_persp = W.maybe(kp, PERSP_P, p)
        return W.mm3(W.mm3(m_persp, m_center), m_aff)

    def branch(fn, k, n):
        """Bank for one branch; under the split the first persp_split(n)[0]
        slots carry perspective (render_cutouts relies on this order)."""
        if not n:
            return jnp.zeros((0, 3, 3))
        keys = jax.random.split(k, n)
        if not split:
            return jax.vmap(lambda kk: fn(kk, True))(keys)
        n_p, n_s = persp_split(n)
        parts = []
        if n_p:
            parts.append(jax.vmap(lambda kk: fn(kk, True))(keys[:n_p]))
        if n_s:
            parts.append(jax.vmap(lambda kk: fn(kk, False))(keys[n_p:]))
        return jnp.concatenate(parts, axis=0)

    kz, kw = jax.random.split(key)
    zoom_ms = branch(one_zoom, kz, n_zoom)
    wide_ms = branch(one_wide, kw, n_wide)
    if square_work_enabled() and aspect != 1.0:
        # fold the pooled→work rescale into every matrix so the warp gathers
        # the identical geometry from the SQUARE pooled canvas (no re-widening
        # upsample; identical PRNG schedule — S is deterministic)
        s = work_from_pooled_matrix(cut_size, aspect)
        zoom_ms = jax.vmap(lambda m: W.mm3(m, s))(zoom_ms) if n_zoom else zoom_ms
        wide_ms = jax.vmap(lambda m: W.mm3(m, s))(wide_ms) if n_wide else wide_ms
    return zoom_ms, wide_ms


def render_cutouts(
    work,
    transforms,
    cut_size: int,
    *,
    reflect_padding,
    fill_color,
    noise_key,
    jitter_key=None,
    compute_dtype=None,
    layout="nhwc",
):
    """Produce the cutout batch from the pooled working canvas.

    reflect_padding: traced bool — True → 'reflection', False → 'border' padding for
    the zoom branch (iteration-parity alternation, pixray.py:1250-1253).
    fill_color: traced scalar — random gray fill for the wide branch.
    jitter_key: when given (live path), per-cutout hue/sat jitter is applied; the
    cached path (spot/image-prompt cutouts) skips jitter, like the reference.
    compute_dtype: dtype for the post-warp elementwise pipeline (jitter/noise) —
    the engine passes bfloat16 when the step's target devices are accelerators
    (the cutouts feed a bf16 perceptor anyway and these passes are
    bandwidth-bound); None keeps float32.
    layout: 'nhwc' returns (N, S, S, 3) float32 (the reference-shaped batch);
    'nchw' returns (N, 3, S, S) in compute_dtype — the warp kernel's NATIVE
    channel-major layout carried straight through a plane-form epilogue into
    the perceptor's channel-major patchify, skipping the two full-bank
    relayout passes and the f32 round-trips of the channels-last path.
    """
    zoom_ms, wide_ms = transforms
    nz, nw = zoom_ms.shape[0], wide_ms.shape[0]
    nchw = layout == "nchw"

    if os.environ.get("PIXRAY_TPU_UNIFIED_WARP", "1") != "0":
        # one mixed-mode bank warp: zoom cuts pad by iteration parity
        # (reflection/border — a traced per-cut mode, not a lax.cond), wide cuts
        # zero-pad and composite over the random gray via closed-form coverage.
        # Default since round 3: the round-2 "miscompile" was an XLA
        # fusion-context effect on the epilogue, fixed by the barrier below
        # (BUGS.md, tools/exp7_fwd_banks.py).  PIXRAY_TPU_UNIFIED_WARP=0
        # restores the per-mode kernels for A/B debugging.
        zoom_mode = jnp.where(reflect_padding, 0, 1).astype(jnp.int32)  # 0=refl, 1=border
        n_zp, n_zs = persp_split(nz) if split_persp_enabled() else (nz, 0)
        n_wp, n_ws = persp_split(nw) if split_persp_enabled() else (nw, 0)
        parts = []
        if n_zp or n_wp:
            # dense bank: the perspective cuts (first persp_split slots of each
            # branch — sample_cut_transforms' order contract)
            ms = jnp.concatenate([zoom_ms[:n_zp], wide_ms[:n_wp]], axis=0)
            modes = jnp.concatenate(
                [jnp.broadcast_to(zoom_mode, (n_zp,)), jnp.full((n_wp,), 2, jnp.int32)],
                axis=0,
            )
            fill_mask = (
                jnp.concatenate([jnp.zeros((n_zp,), bool), jnp.ones((n_wp,), bool)], axis=0)
                if n_wp
                else None
            )
            parts.append(
                warp_batch_modes(
                    work, ms, modes, cut_size, fill_value=fill_color,
                    fill_mask=fill_mask, out_layout=layout,
                )
            )
        if n_zs or n_ws:
            # separable bank: axis-aligned cuts render as two matmuls per cut
            # (warp_batch_separable) — no Pallas launch, native matmul adjoint
            ms_s = jnp.concatenate([zoom_ms[n_zp:], wide_ms[n_wp:]], axis=0)
            modes_s = jnp.concatenate(
                [jnp.broadcast_to(zoom_mode, (n_zs,)), jnp.full((n_ws,), 2, jnp.int32)],
                axis=0,
            )
            fill_mask_s = (
                jnp.concatenate([jnp.zeros((n_zs,), bool), jnp.ones((n_ws,), bool)], axis=0)
                if n_ws
                else None
            )
            parts.append(
                warp_batch_separable(
                    work, ms_s, modes_s, cut_size, fill_value=fill_color,
                    fill_mask=fill_mask_s, out_layout=layout,
                )
            )
        batch = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        # P0 fix (BUGS.md, exp5-7 bisection): pin the bank values at this
        # boundary.  With the single pallas_call as producer, XLA fuses the
        # bf16 jitter/noise epilogue differently than for the concatenate
        # producer of the per-mode path — moving bf16 rounding and with it the
        # exact gray-tie set that zeroes the hue-jitter gradient (ops/color.py),
        # which skews the cutout gradient by ~80% and NaNs the engine by
        # iteration 2 on TPU.  The barrier makes the unified path bitwise-match
        # the per-mode epilogue (tools/exp7_fwd_banks.py: uni+barrier == perm
        # exactly); the bank is already materialized as the kernel's output, so
        # this costs nothing.  The barrier sits right AFTER the compute-dtype
        # rounding so the pinned values are the bf16 ones whose exact gray
        # ties the jitter gradient depends on.
        if compute_dtype is not None:
            batch = batch.astype(compute_dtype)
        batch = jax.lax.optimization_barrier(batch)
    else:
        parts = []
        if nz:
            # iteration-parity padding alternation via lax.cond (one branch runs)
            zoom = jax.lax.cond(
                reflect_padding,
                lambda w: warp_batch(w, zoom_ms, cut_size, padding_mode="reflection"),
                lambda w: warp_batch(w, zoom_ms, cut_size, padding_mode="border"),
                work,
            )
            parts.append(zoom)
        if nw:
            parts.append(
                warp_batch(work, wide_ms, cut_size, padding_mode="fill", fill_value=fill_color)
            )
        batch = jnp.concatenate(parts, axis=0)
        if nchw:  # legacy per-mode kernels are channels-last only
            batch = batch.transpose(0, 3, 1, 2)
        if compute_dtype is not None:
            batch = batch.astype(compute_dtype)

    if nchw:
        # plane-form epilogue: jitter select + noise run per channel plane and
        # the bank is stacked ONCE at the end, so XLA fuses each plane's whole
        # elementwise chain straight into the concat (the stacked-bank form
        # paid separate full-bank passes for stack → select → noise — ~1.1
        # ms/step of the flagship profile).  Per-plane noise keys draw the
        # same iid gaussian distribution as one full-bank draw (values differ
        # bitwise from the stacked path; nothing pins them — the smoke gate
        # compares trajectories of the same code at two precisions).
        r, g, b = batch[:, 0], batch[:, 1], batch[:, 2]
        if jitter_key is not None:
            keys = jax.random.split(jitter_key, batch.shape[0])
            r, g, b = random_color_jitter_planes(
                keys, r, g, b, hue=0.1, saturation=0.1, p=0.8
            )
        if NOISE_FAC:
            k_fac, k_noise = jax.random.split(noise_key)
            facs = jax.random.uniform(
                k_fac, (batch.shape[0], 1, 1), maxval=NOISE_FAC, dtype=batch.dtype
            )
            planes = []
            for plane, kp in zip((r, g, b), jax.random.split(k_noise, 3)):
                planes.append(
                    plane + facs * jax.random.normal(kp, plane.shape, dtype=plane.dtype)
                )
            r, g, b = planes
        # channel-major banks stay in compute dtype for the perceptor (which
        # computes in bf16 anyway)
        return jnp.stack([r, g, b], axis=1)

    if jitter_key is not None:
        keys = jax.random.split(jitter_key, batch.shape[0])
        batch = jax.vmap(partial(random_color_jitter, hue=0.1, saturation=0.1, p=0.8))(
            keys, batch
        )

    if NOISE_FAC:
        k_fac, k_noise = jax.random.split(noise_key)
        facs = jax.random.uniform(
            k_fac, (batch.shape[0], 1, 1, 1), maxval=NOISE_FAC, dtype=batch.dtype
        )
        batch = batch + facs * jax.random.normal(k_noise, batch.shape, dtype=batch.dtype)
    # the channels-last path keeps its f32 contract
    return batch.astype(jnp.float32)


def make_cutouts(
    key,
    image,
    cut_size: int,
    cutn: int,
    aspect: float,
    *,
    reflect_padding,
    fill_color,
    spot_mask=None,
    layout="nhwc",
):
    """One-call convenience: pool, sample transforms, render. Returns (batch, transforms)."""
    k_t, k_jit, k_noise = jax.random.split(key, 3)
    work = pool_to_work(image, cut_size, aspect)
    if spot_mask is not None:
        work = work * spot_mask[..., None]
    transforms = sample_cut_transforms(k_t, cut_size, cutn, aspect)
    batch = render_cutouts(
        work,
        transforms,
        cut_size,
        reflect_padding=reflect_padding,
        fill_color=fill_color,
        noise_key=k_noise,
        jitter_key=k_jit,
        layout=layout,
    )
    return batch, transforms
