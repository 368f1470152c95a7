"""The pure jit-compiled optimization step — the framework's hot loop.

This is the TPU-native re-design of the reference's train→ascend_txt→backward
sequence (/root/reference/pixray.py:1436-1512, 1243-1406).  Where the reference
mutates module state and calls ``.backward()`` per batch, here ONE pure function

    (z, opt_state, key) → (z', opt_state', key', metrics)

is traced and compiled once per static configuration; ``batches`` gradient
accumulation runs as a ``lax.scan`` inside the step; all per-iteration stochastic
quirks of the reference (padding-mode parity, random gray fill, per-cutout jitter,
transform sharing with spot/image prompts) are expressed as explicit PRNG-key
threading so the step stays pure and shardable.

Structure of the loss (ascend_txt parity, pixray.py:1243-1406):
  synth → filters → [flatten alpha] → per-perceptor cutouts → encode →
  prompt-table losses (+spot/+spot_off/+target-frame/+image-prompt) →
  image-label / init-weight losses → transparency loss → custom losses.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from pixray_tpu.engine import cutouts as C
from pixray_tpu.engine.prompts import PromptTable, prompt_losses, single_prompt_loss
from pixray_tpu.ops.grad import spherical_dist_loss
from pixray_tpu.parallel.mesh import shard_cutout_batch


@dataclass
class PerceptorSpec:
    """Static + device data for one perceptor inside the step."""

    name: str
    cut_size: int
    image_fn: Callable  # (variables, images) -> (N, D) normalized embeds
    variables: Any
    table: PromptTable
    spot_table: PromptTable
    spot_off_table: PromptTable
    target_table: PromptTable  # animation per-frame target prompts
    spot_keep_on: Any = None  # (work_h, work_w) float masks, or None
    spot_keep_off: Any = None
    image_prompts: Any = None  # (K, H, W, 3) canvas-sized prompt images, or None
    image_prompt_weight: float | None = None
    # batch preprocessing (range-stretch/resize/standardize) as a separate fn:
    # the ensemble path hoists it OUT of the chunked per-device encode because
    # adjust_range couples the whole batch via global min/max (slip.py:21-42);
    # image_fn is then called with apply_preprocess=False on the chunks
    preprocess_fn: Callable | None = None
    # cutout-bank layout fed to this perceptor: 'nhwc' (reference-shaped) or
    # 'nchw' — the warp kernel's native channel-major layout, kept end-to-end
    # through the epilogue into the ViT's channel-major patchify (engine/core
    # enables it for ViT towers; see cutouts.render_cutouts)
    layout: str = "nhwc"


@dataclass
class StepConfig:
    """Everything static that shapes the compiled step."""

    drawer: Any
    perceptors: list[PerceptorSpec]
    filters: list  # [(filter_obj, weight)]
    custom_losses: list  # [(loss_obj, weight)]
    num_cuts: int
    batches: int
    aspect: float
    transparent: bool = False
    transparent_weight: float = 0.0
    init_weight: float | None = None
    init_weight_dist: float = 0.0
    init_weight_cos: float = 0.0
    init_weight_pix: float = 0.0
    image_label_weight: float = 1.0
    image_prompt_shuffle: bool = False
    args: Any = None  # resolved settings namespace, for custom losses
    mesh: Any = None  # jax.sharding.Mesh for cutout-batch data parallelism
    # dtype of the post-warp cutout pipeline: the engine sets bfloat16 when the
    # step's target devices are accelerators (decided from the actual device set
    # at build time, not a process-global default — see core.py)
    compute_dtype: Any = None
    # perceptor-ensemble placement on the mesh's model axis (one member per
    # device group, parallel/ensemble.py); set by core.py via ensemble_active()
    ensemble: bool = False


def _no_preprocess(image_fn, variables, batch):
    return image_fn(variables, batch, apply_preprocess=False)


def build_loss_fn(cfg: StepConfig, names_sink: list | None = None):
    """Returns loss(z, refs, key, iteration, anim_index) -> (total, (values, img)).

    Loss-term NAMES are static strings and cannot cross the jit boundary; they are
    written into ``names_sink`` at trace time instead (same order as values).
    """

    drawer = cfg.drawer

    def loss_fn(z, refs, key, iteration, anim_index):
        names: list[str] = []
        values: list = []

        def add(name, value):
            names.append(name)
            values.append(value)

        k_synth, k_fill, k_loss, *p_keys = jax.random.split(key, 3 + len(cfg.perceptors))

        img = drawer.synth(refs["drawer_params"], z, iteration, k_synth)

        # filters (pixray.py:1212-1222)
        for i, (filt, weight) in enumerate(cfg.filters):
            img, f_loss = filt(img, jax.random.fold_in(k_loss, i), refs.get("filter_params"))
            add(f"filter:{type(filt).__name__}", weight * f_loss)

        # flatten alpha (pixray.py:1225-1241): random gray squash when transparent
        fill_color = jax.random.uniform(k_fill)
        alpha = None
        if img.shape[-1] == 4:
            colors = img[..., :3]
            if cfg.transparent:
                alpha = img[..., 3:4]
                img = alpha * colors + (1 - alpha) * fill_color
            else:
                img = colors

        reflect_padding = (iteration % 2) == 0

        cur_cutouts = {}
        embeds_last = None

        if cfg.ensemble:
            # perceptor-ensemble placement: render every member's cutout batches
            # (cheap, replicated), then score them all in ONE shard_map with one
            # member per model-axis device group (parallel/ensemble.py).  Keys
            # split exactly as the sequential path so both paths agree numerically.
            from pixray_tpu.parallel.ensemble import EnsembleMember, ensemble_scores

            job_batches = {"main": [], "target": [], "spot": [], "spot_off": []}
            job_tables = {
                "main": [s.table for s in cfg.perceptors],
                "target": [s.target_table for s in cfg.perceptors],
                "spot": [s.spot_table for s in cfg.perceptors],
                "spot_off": [s.spot_off_table for s in cfg.perceptors],
            }
            # image prompts run INSIDE the placed program as pair jobs — one
            # kind per prompt index (or one 'frame' kind under animation),
            # pairing the member's main embeddings with the prompt-image batch
            anim_mode = cfg.args is not None and getattr(cfg.args, "animation_dir", None)
            n_imgp_max = max(
                (s.image_prompts.shape[0] for s in cfg.perceptors
                 if s.image_prompts is not None),
                default=0,
            )
            pair_names = (
                ["image_prompt_frame"] if (anim_mode and n_imgp_max)
                else [f"image_prompt{k}" for k in range(n_imgp_max)]
            )
            pair_jobs = {name: ([], []) for name in pair_names}
            for spec, pk in zip(cfg.perceptors, p_keys):
                k_t, k_jit, k_noise, k_spot_n, k_spot_off_n, k_img_n = jax.random.split(pk, 6)
                work = C.pool_to_work(img, spec.cut_size, cfg.aspect)
                transforms = C.sample_cut_transforms(k_t, spec.cut_size, cfg.num_cuts, cfg.aspect)
                render = partial(
                    C.render_cutouts,
                    transforms=transforms,
                    cut_size=spec.cut_size,
                    reflect_padding=reflect_padding,
                    fill_color=fill_color,
                    compute_dtype=cfg.compute_dtype,
                )
                main = render(work, noise_key=k_noise, jitter_key=k_jit)
                cur_cutouts[spec.cut_size] = main
                # preprocess whole batches HERE: adjust_range couples the batch
                # via its global min/max, so it cannot run on per-device chunks
                pre = spec.preprocess_fn if spec.preprocess_fn is not None else (lambda b: b)
                main_p = pre(main)
                job_batches["main"].append(main_p)
                job_batches["target"].append(main_p)  # target prompts score the main embeds
                job_batches["spot"].append(
                    pre(render(work * spec.spot_keep_on[..., None], noise_key=k_spot_n))
                    if spec.spot_table.size
                    else main_p
                )
                job_batches["spot_off"].append(
                    pre(render(work * spec.spot_keep_off[..., None], noise_key=k_spot_off_n))
                    if spec.spot_off_table.size
                    else main_p
                )
                if pair_names:
                    n_imgp = (
                        spec.image_prompts.shape[0]
                        if spec.image_prompts is not None else 0
                    )
                    weight = (
                        1.0 if spec.image_prompt_weight is None
                        else spec.image_prompt_weight
                    )
                    k_imgs = jax.random.split(k_img_n, max(n_imgp, 1) + 1)

                    def prompt_batch(timg, key_i, shuffle_key):
                        t = transforms
                        if cfg.image_prompt_shuffle:
                            t = C.sample_cut_transforms(
                                shuffle_key, spec.cut_size, cfg.num_cuts, cfg.aspect
                            )
                        p_work = C.pool_to_work(timg, spec.cut_size, cfg.aspect)
                        return pre(C.render_cutouts(
                            p_work, t, spec.cut_size,
                            reflect_padding=reflect_padding, fill_color=fill_color,
                            noise_key=key_i, compute_dtype=cfg.compute_dtype,
                        ))

                    for slot, name in enumerate(pair_names):
                        if n_imgp == 0:
                            pair_jobs[name][0].append(main_p)  # inert: weight 0
                            pair_jobs[name][1].append(0.0)
                        elif anim_mode:
                            timg = refs["image_prompts"][spec.name][anim_index % n_imgp]
                            pair_jobs[name][0].append(prompt_batch(
                                timg, k_imgs[0], jax.random.fold_in(k_imgs[-1], 0)
                            ))
                            pair_jobs[name][1].append(weight)
                        elif slot < n_imgp:
                            timg = refs["image_prompts"][spec.name][slot]
                            pair_jobs[name][0].append(prompt_batch(
                                timg, k_imgs[slot], jax.random.fold_in(k_imgs[-1], slot)
                            ))
                            pair_jobs[name][1].append(weight)
                        else:
                            pair_jobs[name][0].append(main_p)
                            pair_jobs[name][1].append(0.0)

            members = [
                EnsembleMember(
                    s.name,
                    partial(_no_preprocess, s.image_fn)
                    if s.preprocess_fn is not None
                    else s.image_fn,
                    int(s.table.embeds.shape[1]),
                )
                for s in cfg.perceptors
            ]
            variables_list = [refs["perceptors"][s.name] for s in cfg.perceptors]
            out_vals, embeds_last = ensemble_scores(
                cfg.mesh,
                members,
                job_batches,
                job_tables,
                variables_list,
                # the embeds global costs one replicated encode — only pay it
                # when a custom loss can consume it (aesthetic, user plug-ins)
                want_iii_of=len(cfg.perceptors) - 1 if cfg.custom_losses else None,
                pair_jobs=pair_jobs,
            )
            for pi, spec in enumerate(cfg.perceptors):
                for i in range(spec.table.size):
                    add(f"{spec.name}:prompt{i}", out_vals["main"][pi, i])
                if spec.target_table.size:
                    idx = anim_index % spec.target_table.size
                    add(f"{spec.name}:target_frame", out_vals["target"][pi, idx])
                for i in range(spec.spot_table.size):
                    add(f"{spec.name}:spot{i}", out_vals["spot"][pi, i])
                for i in range(spec.spot_off_table.size):
                    add(f"{spec.name}:spot_off{i}", out_vals["spot_off"][pi, i])
                # same per-spec term order as the sequential path below
                n_imgp = (
                    spec.image_prompts.shape[0]
                    if spec.image_prompts is not None else 0
                )
                for slot, name in enumerate(pair_names):
                    if name in out_vals and (slot < n_imgp or anim_mode) and n_imgp:
                        add(f"{spec.name}:{name}", out_vals[name][pi, 0])

        for spec, pk in [] if cfg.ensemble else list(zip(cfg.perceptors, p_keys)):
            k_t, k_jit, k_noise, k_spot_n, k_spot_off_n, k_img_n = jax.random.split(pk, 6)
            work = C.pool_to_work(img, spec.cut_size, cfg.aspect)
            transforms = C.sample_cut_transforms(k_t, spec.cut_size, cfg.num_cuts, cfg.aspect)

            df = "NCHW" if spec.layout == "nchw" else "NHWC"
            encode = partial(
                spec.image_fn, refs["perceptors"][spec.name], data_format=df
            )
            render = partial(
                C.render_cutouts,
                transforms=transforms,
                cut_size=spec.cut_size,
                reflect_padding=reflect_padding,
                fill_color=fill_color,
                compute_dtype=cfg.compute_dtype,
                layout=spec.layout,
            )

            main = render(work, noise_key=k_noise, jitter_key=k_jit)
            main = shard_cutout_batch(main, cfg.mesh)
            # custom losses consume cur_cutouts channels-last (the reference's
            # cutouts dict shape); convert lazily — only when one exists
            cur_cutouts[spec.cut_size] = (
                main.transpose(0, 2, 3, 1).astype(jnp.float32)
                if (spec.layout == "nchw" and cfg.custom_losses)
                else main
            )
            iii = encode(main)
            embeds_last = iii

            pl = prompt_losses(iii, spec.table)
            for i in range(spec.table.size):
                add(f"{spec.name}:prompt{i}", pl[i])

            # animation target-frame prompt: one row selected by anim_index
            if spec.target_table.size:
                tl = prompt_losses(iii, spec.target_table)  # (T,)
                idx = anim_index % spec.target_table.size
                add(f"{spec.name}:target_frame", tl[idx])

            # spot prompts use the SAME transforms, masked working canvas
            if spec.spot_table.size:
                spot_cuts = render(work * spec.spot_keep_on[..., None], noise_key=k_spot_n)
                spot_cuts = shard_cutout_batch(spot_cuts, cfg.mesh)
                iii_s = encode(spot_cuts)
                sl = prompt_losses(iii_s, spec.spot_table)
                for i in range(spec.spot_table.size):
                    add(f"{spec.name}:spot{i}", sl[i])
            if spec.spot_off_table.size:
                spot_cuts = render(work * spec.spot_keep_off[..., None], noise_key=k_spot_off_n)
                spot_cuts = shard_cutout_batch(spot_cuts, cfg.mesh)
                iii_so = encode(spot_cuts)
                sl = prompt_losses(iii_so, spec.spot_off_table)
                for i in range(spec.spot_off_table.size):
                    add(f"{spec.name}:spot_off{i}", sl[i])

            # image prompts: same transforms (pixray.py:1308-1336); if shuffling,
            # fresh transforms per prompt image
            if spec.image_prompts is not None:
                n_imgp = spec.image_prompts.shape[0]
                k_imgs = jax.random.split(k_img_n, n_imgp + 1)
                weight = 1.0 if spec.image_prompt_weight is None else spec.image_prompt_weight
                anim_mode = cfg.args is not None and getattr(cfg.args, "animation_dir", None)

                def prompt_loss_for(timg, key_i, shuffle_key):
                    t = transforms
                    if cfg.image_prompt_shuffle:
                        t = C.sample_cut_transforms(shuffle_key, spec.cut_size, cfg.num_cuts, cfg.aspect)
                    p_work = C.pool_to_work(timg, spec.cut_size, cfg.aspect)
                    batch = C.render_cutouts(
                        p_work, t, spec.cut_size,
                        reflect_padding=reflect_padding, fill_color=fill_color,
                        noise_key=key_i, compute_dtype=cfg.compute_dtype,
                        layout=spec.layout,
                    )
                    batch = shard_cutout_batch(batch, cfg.mesh)
                    embed = encode(batch)
                    return single_prompt_loss(iii, embed, weight)

                if anim_mode:
                    # animation selects ONE prompt image per frame (pixray.py:1313-1317)
                    timg = refs["image_prompts"][spec.name][anim_index % n_imgp]
                    add(
                        f"{spec.name}:image_prompt_frame",
                        prompt_loss_for(timg, k_imgs[0], jax.random.fold_in(k_imgs[-1], 0)),
                    )
                else:
                    for k_i in range(n_imgp):
                        timg = refs["image_prompts"][spec.name][k_i]
                        add(
                            f"{spec.name}:image_prompt{k_i}",
                            prompt_loss_for(timg, k_imgs[k_i], jax.random.fold_in(k_imgs[-1], k_i)),
                        )

        # image-label loss (pixray.py:1344-1349): spherical distance in latent space
        if refs.get("z_labels") is not None:
            z_flat = ravel_pytree(z)[0][None, :]
            for i, z_label in enumerate(refs["z_labels"]):
                lbl = jnp.reshape(z_label, (1, -1))
                add(
                    f"image_label{i}",
                    jnp.mean(spherical_dist_loss(z_flat, lbl)) * cfg.image_label_weight,
                )

        # init-weight losses (pixray.py:1351-1375)
        if cfg.init_weight:
            z_flat = ravel_pytree(z)[0][None, :]
            z0 = jnp.reshape(refs["z_orig_flat"], (1, -1))
            add("init_weight", jnp.mean(spherical_dist_loss(z_flat, z0)) * cfg.init_weight)
        if cfg.init_weight_dist:
            z_flat = ravel_pytree(z)[0]
            z0 = refs["z_orig_flat"]
            add("init_weight_dist", jnp.mean((z_flat - z0) ** 2) * cfg.init_weight_dist / 2)
        if cfg.init_weight_pix:
            add(
                "init_weight_pix",
                jnp.mean(jnp.abs(img - refs["init_image"])) * cfg.init_weight_pix / 2,
            )
        if cfg.init_weight_cos:
            z_flat = ravel_pytree(z)[0][None, :]
            z0 = jnp.reshape(refs["z_orig_flat"], (1, -1))
            cos = optax.cosine_similarity(z_flat, z0)
            add("init_weight_cos", jnp.mean(1.0 - cos) * cfg.init_weight_cos)

        # transparency loss (pixray.py:1383-1386)
        if alpha is not None and cfg.transparent_weight != 0:
            add("transparent", cfg.transparent_weight * jnp.mean(alpha))

        # custom losses (pixray.py:1388-1398)
        loss_globals = {"cur_iteration": iteration, "embeds": embeds_last,
                        "fill_color": fill_color}
        for i, (loss_obj, weight) in enumerate(cfg.custom_losses):
            # user plug-ins may follow the reference's narrower get_loss signature
            # (no key/params); pass only what they accept
            import inspect

            accepted = inspect.signature(loss_obj.get_loss).parameters
            kwargs = dict(
                globals=loss_globals,
                lossGlobals=refs.get("loss_globals"),
            )
            if "key" in accepted:
                kwargs["key"] = jax.random.fold_in(k_loss, 1000 + i)
            if "params" in accepted:
                kwargs["params"] = refs.get("loss_params", {}).get(i)
            out = loss_obj.get_loss(cur_cutouts, img, cfg.args, **kwargs)
            if isinstance(out, (list, tuple)):
                for j, l in enumerate(out):
                    add(f"loss:{type(loss_obj).__name__}:{j}", weight * l)
            else:
                add(f"loss:{type(loss_obj).__name__}", weight * out)

        total = jnp.sum(jnp.stack(values)) if values else jnp.zeros(())
        if names_sink is not None:
            names_sink[:] = names
        return total, (jnp.stack(values) if values else jnp.zeros((0,)), img)

    return loss_fn


def _build_step_core(cfg: StepConfig, optimizer):
    """The unjitted step body shared by build_step and build_multi_step."""
    names_sink: list = []
    loss_fn = build_loss_fn(cfg, names_sink)
    value_grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(z, opt_state, key, iteration, anim_index, lr_scale, refs):
        keys = jax.random.split(key, cfg.batches)
        # metrics come from the FIRST batch (reference checkin reads batch 0,
        # pixray.py:1466-1479); gradients accumulate over all batches
        if cfg.batches == 1:
            (total0, (vals0, img0)), grads_acc = value_grad_fn(
                z, refs, keys[0], iteration, anim_index
            )
        else:
            # ONE trace of the loss, scanned over batch keys — the compiled
            # graph size is independent of `batches` (at quality=supreme the
            # reference runs batches=4, pixray.py:1864-1878)
            shapes = jax.eval_shape(
                value_grad_fn, z, refs, keys[0], iteration, anim_index
            )
            (t_s, (v_s, i_s)), g_s = shapes

            def zeros_of(s):
                return jax.tree_util.tree_map(
                    lambda a: jnp.zeros(a.shape, a.dtype), s
                )

            carry0 = (zeros_of(g_s), zeros_of(t_s), zeros_of(v_s), zeros_of(i_s))

            def body(carry, inp):
                b, k = inp
                grads_acc, total0, vals0, img0 = carry
                (total, (vals, img)), g = value_grad_fn(
                    z, refs, k, iteration, anim_index
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                first = b == 0
                total0 = jnp.where(first, total, total0)
                vals0 = jnp.where(first, vals, vals0)
                img0 = jnp.where(first, img, img0)
                return (grads_acc, total0, vals0, img0), None

            (grads_acc, total0, vals0, img0), _ = jax.lax.scan(
                body, carry0, (jnp.arange(cfg.batches), keys)
            )

        updates, opt_state = optimizer.update(grads_acc, opt_state, z)
        # LR-drop schedule: uniform scale over all param groups (reference divides
        # every group's lr by 10**num_drops, pixray.py:520-555)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        z = optax.apply_updates(z, updates)
        z = cfg.drawer.clip_params(z)
        return z, opt_state, total0, vals0, img0

    return step, names_sink


def build_step(cfg: StepConfig, optimizer, mesh=None, shard_cutouts=False):
    """Build the jitted train step.

    step(z, opt_state, key, iteration, anim_index, refs) →
        (z, opt_state, total_loss, loss_values, image)

    ``batches`` gradient accumulation is a lax.scan; the optimizer update and the
    drawer's latent projection (clip_params) run once at the end, matching the
    reference's train() (pixray.py:1436-1512).
    """
    step, names_sink = _build_step_core(cfg, optimizer)
    return jax.jit(step, donate_argnums=(0, 1)), names_sink


def build_multi_step(cfg: StepConfig, optimizer, n_steps: int):
    """Build a jitted S-step block: ``lax.scan`` over ``n_steps`` optimizer steps
    in ONE device dispatch.

    multi(z, opt_state, key, it0, anim_index, lr_scale, refs) →
        (z, opt_state, key, totals (S,), values (S, L), last_image)

    TPU-first rationale: the single-step loop pays one host→device dispatch per
    optimizer step (dozens of ms through remote relays; ~10-100 µs even locally);
    a block amortizes it S× with zero semantic drift — the PRNG schedule inside
    the scan (``key, k = split(key)`` per step) is exactly the host schedule of
    engine/core.py's train(), so blocked and single-step runs follow identical
    trajectories.  The engine only uses blocks between host-event boundaries
    (checkin / LR drops / overlay / video frames — see Engine._block_span).
    """
    step, names_sink = _build_step_core(cfg, optimizer)

    def multi(z, opt_state, key, it0, anim_index, lr_scale, refs):
        img_shape = jax.eval_shape(
            step, z, opt_state, key, it0, anim_index, lr_scale, refs
        )[4]

        def body(carry, it):
            z, opt_state, key, _img = carry
            key, k_step = jax.random.split(key)
            z, opt_state, total, vals, img = step(
                z, opt_state, k_step, it, anim_index, lr_scale, refs
            )
            return (z, opt_state, key, img), (total, vals)

        img0 = jnp.zeros(img_shape.shape, img_shape.dtype)
        (z, opt_state, key, img), (totals, valss) = jax.lax.scan(
            body, (z, opt_state, key, img0), it0 + jnp.arange(n_steps)
        )
        return z, opt_state, key, totals, valss, img

    return jax.jit(multi, donate_argnums=(0, 1)), names_sink
