"""Engine: session init + host-side run loop around the jitted step.

Parity map to the reference engine (/root/reference/pixray.py):
- ``Engine.__init__``  ≙ do_init (578-1019): seeding, drawer/perceptor loading,
  filters, init/overlay images, prompt tables, optimizers.
- ``Engine.run``       ≙ do_run (1540-1638): plain loop, animation ring,
  return_display streaming, video emit.
- ``Engine.train``     ≙ train (1436-1512): one optimizer step + scheduling.
- ``Engine.checkin``   ≙ checkin (1158-1201): provenance PNG + loss line.

The actual compute lives in :mod:`pixray_tpu.engine.step`; everything here is
host-side control (Python-level cadence decisions, PIL round-trips, file IO).
"""

from __future__ import annotations

import hashlib
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from PIL import Image

from pixray_tpu import registry
from pixray_tpu.engine import cutouts as C
from pixray_tpu.engine.optimizers import build_optimizer
from pixray_tpu.engine.prompts import build_prompt_tables
from pixray_tpu.engine.schedule import BestTracker, apply_overlay
from pixray_tpu.engine.step import PerceptorSpec, StepConfig, build_step
from pixray_tpu.io import images as IM
from pixray_tpu.io import output as OUT
from pixray_tpu.models.perceptor import get_clip_perceptor
from pixray_tpu.prompt import parse_prompt
from pixray_tpu.utils import (
    get_file_path,
    old_random_noise_image,
    random_gradient_image,
    random_noise_image,
    real_glob,
)


def is_notebook() -> bool:
    """Jupyter/colab detection (reference pixray.py:147-161)."""
    try:
        shell = get_ipython().__class__.__name__  # noqa: F821
        return shell in ("ZMQInteractiveShell", "Shell")
    except NameError:
        return False


def _progress_bar():
    """tqdm run progress (reference pixray.py:1613, notebook-aware like 163-168);
    degrades to a no-op context when tqdm is unavailable."""
    try:
        if is_notebook():
            from tqdm.notebook import tqdm
        else:
            from tqdm import tqdm
        return tqdm()
    except Exception:
        import contextlib

        return contextlib.nullcontext()


def _notebook_display(args, it, outfile):
    """Inline image display on the display_every cadence (pixray.py:1196-1200)."""
    if not is_notebook() or args.display_every is None or it % args.display_every != 0:
        return
    from IPython import display

    if args.display_clear:
        display.clear_output()
    display.display(display.Image(outfile))


def resolve_seed(seed_setting):
    """int / numeric-string / arbitrary-string(sha512) / None seeding
    (reference pixray.py:589-606)."""
    if seed_setting is None:
        seed = int.from_bytes(os.urandom(4), "big")
    elif isinstance(seed_setting, int):
        seed = seed_setting
    elif isinstance(seed_setting, str) and seed_setting.isdigit():
        seed = int(seed_setting)
    else:
        digest = hashlib.sha512(str(seed_setting).encode()).digest()
        seed = int.from_bytes(digest, "big") % 0x100000000
    return seed


class Engine:
    def __init__(self, args):
        self.args = args
        self.seed_used = resolve_seed(args.seed)
        print("Using seed:", self.seed_used)
        int_seed = int(self.seed_used) % (2**30)
        np.random.seed(int_seed)
        random.seed(int_seed)
        self.key = jax.random.PRNGKey(int_seed)
        self.np_rng = np.random.default_rng(int_seed)

        registry.load_registries()

        # ---- drawer
        self.drawer = registry.DRAWER_CLASSES[args.drawer](args)
        self.drawer.load_model(args)
        side_x, side_y = self.drawer.snap_canvas(args.size)
        self.side_x, self.side_y = side_x, side_y

        # ---- precision
        dtype = jnp.bfloat16 if getattr(args, "precision", "bf16") == "bf16" else jnp.float32

        # ---- device mesh (new capability; SURVEY.md §2.3)
        from pixray_tpu.parallel.mesh import build_mesh, init_distributed, pad_cuts_for_mesh

        self.mesh = None
        if getattr(args, "shard_cutouts", True):
            try:
                if init_distributed():  # multi-host (DCN) cluster, if configured
                    print(
                        f"Joined JAX cluster: process {jax.process_index()}/"
                        f"{jax.process_count()}, {jax.device_count()} global devices"
                    )
                self.mesh = build_mesh(getattr(args, "mesh_shape", "auto"))
            except Exception as e:
                print(f"mesh setup skipped: {e}")
        if self.mesh is not None:
            padded = pad_cuts_for_mesh(args.num_cuts, self.mesh)
            if padded != args.num_cuts:
                print(f"padding num_cuts {args.num_cuts} -> {padded} for the {self.mesh.shape} mesh")
                args.num_cuts = padded
            print(f"Using device mesh {dict(self.mesh.shape)} for cutout data-parallelism")

        # ---- perceptors (cached across sessions, pixray.py:633-640)
        self.perceptors = [get_clip_perceptor(name, dtype=dtype) for name in args.clip_models]

        # ---- filters
        self.filters = []
        if args.filters is not None:
            for spec in [f.strip() for f in args.filters.split(",")]:
                name, weight, _stop = parse_prompt(spec)
                filt_cls = registry.FILTER_CLASSES.get(name)
                if filt_cls is None:
                    raise ValueError(f"Requested filter not found, aborting: {name}")
                self.filters.append((filt_cls(args), weight))

        # ---- init image / noise (pixray.py:674-729)
        self.init_image_tensor = None
        self.init_image_rgba_list: list[Image.Image] = []
        init_tensor = None
        if args.init_image or args.init_noise:
            if args.init_noise == "pixels":
                img = random_noise_image(args.size[0], args.size[1], self.np_rng)
            elif args.init_noise == "gradient":
                img = random_gradient_image(args.size[0], args.size[1], self.np_rng)
            elif args.init_noise == "snow":
                img = old_random_noise_image(args.size[0], args.size[1], self.np_rng)
            else:
                img = Image.new(mode="RGB", size=(args.size[0], args.size[1]), color=(255, 255, 255))
            starting_image = img.convert("RGB").resize((side_x, side_y), Image.LANCZOS)

            if args.init_image:
                init_images = IM.open_images(args.init_image)
                for init_image in init_images:
                    rgb = init_image.convert("RGB").resize((side_x, side_y), Image.LANCZOS)
                    self.init_image_tensor = jnp.asarray(IM.to_tensor(rgb))
                    rgba = init_image.convert("RGBA").resize((side_x, side_y), Image.LANCZOS)
                    top = rgba.copy()
                    if args.init_image_alpha and args.init_image_alpha >= 0:
                        top.putalpha(args.init_image_alpha)
                    cur = starting_image.copy()
                    cur.paste(top, (0, 0), top)
                    self.init_image_rgba_list.append(cur)
                init_tensor = self.init_image_tensor * 2 - 1
            else:
                init_tensor = jnp.asarray(IM.to_tensor(starting_image)) * 2 - 1

        self.key, k_init = jax.random.split(self.key)
        self.z = self.drawer.init_params(k_init, init_tensor)
        self.z_orig_flat = ravel_pytree(self.z)[0]

        # ---- overlay images (pixray.py:731-747)
        self.overlay_image_rgba_list: list[Image.Image] = []
        self.overlay_image_rgba = None
        if args.overlay_image is not None:
            for overlay_image in IM.open_images(args.overlay_image):
                rgba = overlay_image.convert("RGBA").resize((side_x, side_y), Image.LANCZOS)
                if args.overlay_alpha:
                    rgba.putalpha(args.overlay_alpha)
                self.overlay_image_rgba_list.append(rgba)
            self.overlay_image_rgba = self.overlay_image_rgba_list[0]

        # ---- image labels → latent-space targets (pixray.py:833-850)
        self.z_labels = None
        if args.image_labels is not None:
            labels = []
            for path in real_glob(args.image_labels):
                rgb = IM.load_image_rgb(path, (side_x, side_y))
                z_label = ravel_pytree(self.drawer.params_from_image(jnp.asarray(rgb) * 2 - 1))[0]
                labels.append(np.asarray(z_label))
            stacked = np.stack(labels)
            stacked = stacked / np.linalg.norm(stacked, axis=-1, keepdims=True)
            mean = stacked.mean(axis=0)
            mean = mean / np.linalg.norm(mean)
            self.z_labels = [jnp.asarray(mean)]

        # ---- prompt tables
        target_specs = None
        if args.target_images:
            target_specs = []
            for target_image in args.target_images:
                f1, weight, stop = parse_prompt(target_image)
                if "http" in f1:
                    target_specs.append((f1, weight, stop))
                else:
                    target_specs.extend((f, weight, stop) for f in real_glob(f1))
        tables, spot_tables, spot_off_tables, target_tables, clip_embed = build_prompt_tables(
            args, self.perceptors, drawer=self.drawer, target_image_paths=target_specs
        )
        if clip_embed is not None and hasattr(self.drawer, "set_clip_embed"):
            self.drawer.set_clip_embed(clip_embed)

        # ---- image prompts per perceptor (canvas-sized tensors, pixray.py:947-953)
        image_prompt_arrays = {}
        if args.image_prompts:
            imgs = []
            for path in args.image_prompts:
                pil = IM.open_image(path).convert("RGB")
                pil = IM.resize_area_preserving(pil, (side_x, side_y))
                pil = pil.resize((side_x, side_y), Image.LANCZOS)
                imgs.append(IM.to_tensor(pil))
            stacked = jnp.asarray(np.stack(imgs))
            image_prompt_arrays = {p.name: stacked for p in self.perceptors}

        # ---- spot masks at working-canvas resolution per perceptor
        aspect = args.aspect_width
        spot_keeps = {}
        if args.spot_prompts or args.spot_prompts_off:
            for p in self.perceptors:
                wh, ww = C.pooled_canvas_shape(p.input_resolution, aspect)
                mask = IM.load_spot_mask(args.spot_file, p.input_resolution, aspect)
                mask = np.asarray(
                    Image.fromarray((mask * 255).astype(np.uint8)).resize((ww, wh), Image.LANCZOS),
                    dtype=np.float32,
                ) / 255.0
                white = (mask >= 0.5).astype(np.float32)
                # spot=1 zeroes the white (background) region → keep 1-white
                spot_keeps[p.name] = (jnp.asarray(1.0 - white), jnp.asarray(white))

        # ---- custom losses (pixray.py:961-995)
        self.custom_losses = []
        self.loss_globals = {}
        if args.custom_loss is not None and isinstance(args.custom_loss, str):
            for chunk in [c.strip() for c in args.custom_loss.split(",")]:
                if chunk.find("->") > 0:
                    parts = chunk.split("->")
                    loss_spec, instance_args = parts[0], parts[1:]
                else:
                    loss_spec, instance_args = chunk, []
                name, weight, _stop = parse_prompt(loss_spec)
                loss_cls = registry.LOSS_CLASSES[name]
                loss_obj = loss_cls(args)
                loss_obj.instance_settings(instance_args)
                self.custom_losses.append((loss_obj, weight))
            for loss_obj, _w in self.custom_losses:
                self.loss_globals.update(loss_obj.add_globals(args))

        # ---- step config
        from pixray_tpu.parallel.ensemble import ensemble_active

        use_ensemble = ensemble_active(self.mesh, len(self.perceptors))
        specs = []
        for p in self.perceptors:
            keep_on, keep_off = spot_keeps.get(p.name, (None, None))
            # channel-major cutout fast lane: ViT towers consume the warp
            # kernel's native (N, C, S, S) bank through a plane-form epilogue
            # and channel-major patchify (no full-bank relayouts); ResNet
            # towers and the ensemble placement path stay channels-last.
            layout = (
                "nchw"
                if (
                    not use_ensemble
                    and getattr(p.config, "vision_kind", None) == "vit"
                    and os.environ.get("PIXRAY_TPU_NCHW", "1") == "1"
                )
                else "nhwc"
            )
            specs.append(
                PerceptorSpec(
                    name=p.name,
                    cut_size=p.input_resolution,
                    image_fn=p.image_fn,
                    preprocess_fn=p.preprocess,
                    variables=p.variables,
                    table=tables[p.name],
                    spot_table=spot_tables[p.name],
                    spot_off_table=spot_off_tables[p.name],
                    target_table=target_tables[p.name],
                    spot_keep_on=keep_on,
                    spot_keep_off=keep_off,
                    image_prompts=image_prompt_arrays.get(p.name),
                    image_prompt_weight=args.image_prompt_weight,
                    layout=layout,
                )
            )
        if use_ensemble:
            m = dict(self.mesh.shape)["model"]
            print(
                f"Placing {len(self.perceptors)} perceptors on {m} model-axis "
                f"device groups (one member per group)"
            )

        self.step_cfg = StepConfig(
            drawer=self.drawer,
            perceptors=specs,
            filters=self.filters,
            custom_losses=self.custom_losses,
            num_cuts=args.num_cuts,
            batches=args.batches,
            aspect=aspect,
            transparent=args.transparent,
            transparent_weight=args.transparent_weight,
            init_weight=args.init_weight,
            init_weight_dist=args.init_weight_dist,
            init_weight_cos=args.init_weight_cos,
            init_weight_pix=args.init_weight_pix,
            image_label_weight=args.image_label_weight,
            image_prompt_shuffle=args.image_prompt_shuffle,
            args=args,
            mesh=self.mesh,
            compute_dtype=self._compute_dtype(),
            ensemble=use_ensemble,
        )

        # refs passed into every step call (weights/tables/targets).  With
        # ensemble placement each model group reads only its own member's
        # (replicated) weights; otherwise weights are FSDP-sharded over the
        # model axis
        from pixray_tpu.parallel.mesh import replicated, shard_perceptor_params

        place_weights = replicated if use_ensemble else shard_perceptor_params
        self.refs = {
            "drawer_params": self.drawer.model_params,
            "perceptors": {
                p.name: place_weights(p.variables, self.mesh)
                for p in self.perceptors
            },
            "image_prompts": image_prompt_arrays,
            "z_labels": self.z_labels,
            "z_orig_flat": self.z_orig_flat,
            "init_image": self.init_image_tensor,
            "loss_globals": self.loss_globals,
            "loss_params": {i: obj.params for i, (obj, _w) in enumerate(self.custom_losses)},
            "filter_params": {},
        }

        # ---- optimizer (engine-global or drawer-specific, pixray.py:520-555)
        self.tracker = BestTracker(max_loss_drops=args.max_loss_drops)
        self._build_optimizer()

        # ---- jitted functions
        self._step, self.loss_names = build_step(self.step_cfg, self.optimizer)
        # multi-step blocks: S optimizer steps per device dispatch (lax.scan in
        # step.py::build_multi_step), amortizing host→device dispatch latency.
        # Built lazily on first eligible block; one fixed block size → one graph.
        # _next_block double-buffers: the following block is dispatched BEFORE
        # the current block's results are pulled, so the device never idles on
        # host round-trips between blocks.
        self._multi_step = None
        self._block = None  # buffered per-step results of the in-flight block
        self._next_block = None  # speculatively dispatched following block
        self._display_streaming = False  # run(return_display=True) sets this
        # drawer params travel as an ARGUMENT: closure-captured weights become
        # jaxpr constants (3.9GB for yfcc_2 vdiff), which bloats lowering and
        # exceeds remote-compile request size limits
        self._synth = jax.jit(
            lambda params, z, it, key: self.drawer.synth(params, z, it, key)
        )

        self.cur_iteration = 0
        self.cur_anim_index = None
        self.anim_output_files: list[str] = []
        self.anim_cur_zs: list = []
        self.last_loss_values = None
        self._pending_loss = None

        if getattr(args, "resume_from", None):
            from pixray_tpu.engine.checkpoint import restore_session

            it = restore_session(args.resume_from, self)
            print(f"Resumed session from {args.resume_from} at iteration {it}")

        print("Optimising using:", args.optimiser)
        if args.prompts:
            print("Using text prompts:", args.prompts)
        if args.spot_prompts:
            print("Using spot prompts:", args.spot_prompts)
        if args.image_prompts:
            print("Using image prompts:", args.image_prompts)
        if args.init_image:
            print(f"Using initial image {args.init_image} ({len(self.init_image_rgba_list)})")

    # ------------------------------------------------------------------ optimizer
    def _build_optimizer(self):
        """Engine-global or drawer-specific optimizer (pixray.py:520-555)."""
        drawer_opt = self.drawer.get_opts(self.args, 1.0)
        if drawer_opt is not None:
            self.optimizer = drawer_opt
        else:
            drawer_lr = getattr(self.drawer, "learning_rate", None)
            base = drawer_lr if drawer_lr is not None else self.args.learning_rate
            self.optimizer = build_optimizer(self.args.optimiser, base)
        self.opt_state = self.optimizer.init(self.z)
        self.lr_scale = 1.0 / self.tracker.drop_divisor

    def drop_learning_rate(self):
        """Reference semantics: fresh optimizer state at the dropped LR
        (rebuild_optimisers is called anew, pixray.py:1511)."""
        self.opt_state = self.optimizer.init(self.z)
        self.lr_scale = 1.0 / self.tracker.drop_divisor

    # ------------------------------------------------------------------ rendering
    def synth_image(self, iteration=None) -> Image.Image:
        """Current canvas as PIL (through filters? no — raw drawer output, like
        reference do_synth_and_filter(to_file=True) minus stochastic filters)."""
        it = self.cur_iteration if iteration is None else iteration
        out = self._synth(self.refs["drawer_params"], self.z, it, jax.random.PRNGKey(0))
        arr = np.asarray(out)
        if arr.shape[-1] == 4 and not self.args.transparent:
            arr = arr[..., :3]
        return IM.from_tensor(arr)

    def re_average_z(self):
        """Overlay application: render → paste overlay → re-encode latent
        (reference re_average_z, pixray.py:1408-1420)."""
        cur = self.synth_image().convert("RGB")
        if self.overlay_image_rgba is not None:
            cur.paste(self.overlay_image_rgba, (0, 0), mask=self.overlay_image_rgba)
        cur = cur.resize((self.side_x, self.side_y), Image.LANCZOS)
        self.z = self.drawer.params_from_image(jnp.asarray(IM.to_tensor(cur)) * 2 - 1)

    def reapply_from_image(self, pil_image):
        pil_image = pil_image.convert("RGB").resize((self.side_x, self.side_y), Image.LANCZOS)
        try:
            self.z = self.drawer.params_from_image(jnp.asarray(IM.to_tensor(pil_image)) * 2 - 1)
        except NotImplementedError:
            # drawers without an image encoder silently skip re-application,
            # matching the reference's no-op reapply_from_tensor (vdiff.py:147-148)
            pass

    def _compute_dtype(self):
        """Dtype for the post-warp cutout pipeline, decided from the device set
        the step will actually execute on (the mesh's devices when sharded, the
        process default otherwise) — NOT a process-global default-device sniff,
        which lies under explicit jax.device_put/shard_map placement.
        $PIXRAY_TPU_COMPUTE_DTYPE (float32|bfloat16) overrides."""
        override = os.environ.get("PIXRAY_TPU_COMPUTE_DTYPE")
        if override:
            return jnp.dtype(override)
        if self.mesh is not None:
            platforms = {d.platform for d in self.mesh.devices.flat}
        else:
            platforms = {jax.devices()[0].platform}
        return jnp.bfloat16 if platforms - {"cpu"} else None

    # ------------------------------------------------------------------ blocks
    BLOCK_STEPS = 8  # fixed block size: exactly one extra compiled graph

    def _block_size(self, cur_it: int) -> int:
        """How many steps may run as one device dispatch starting at ``cur_it``.

        Returns BLOCK_STEPS only when no host event interrupts the block:
        post-step events (checkin/save_every, LR drops, session checkpoints) may
        fall only on the block's LAST iteration; pre-step events (overlay) may
        not fall inside it at all.  Per-iteration host features (video frames,
        vdiff re-noise, auto_stop's prompt LR decisions) disable blocking
        entirely.  Animation blocks fine — anim_index is an argument of the
        jitted step and a frame's save_every-step span has no interior host
        events — but a block must never cross the span's end (the frame loop
        swaps self.z between frames).  --steps_per_call 1 forces single-step."""
        args = self.args
        if getattr(args, "steps_per_call", 0) == 1:
            return 1
        n = self.BLOCK_STEPS if args.steps_per_call == 0 else args.steps_per_call
        if (
            args.make_video
            or args.auto_stop
            or hasattr(self.drawer, "post_step")
        ):
            return 1
        n = min(n, args.iterations - cur_it)
        if self.cur_anim_index is not None:
            n = min(n, args.save_every - (cur_it % args.save_every))
        if n < 2:
            return 1
        for it in range(cur_it, cur_it + n - 1):  # post-step events: all but last
            if it % args.save_every == 0:
                n = it - cur_it + 1
                break
            if it in args.learning_rate_drops:
                n = it - cur_it + 1
                break
            ck = getattr(args, "checkpoint_every", 0)
            if ck and it and it % ck == 0:
                n = it - cur_it + 1
                break
            # display streaming consumes last_image right after iteration `it`
            # (run() yields when (it+1) % display_every == 0); blocks carry only
            # their FINAL image, so a mid-block display would show a future frame
            de = args.display_every
            if self._display_streaming and de and (it + 1) % de == 0:
                n = it - cur_it + 1
                break
        for it in range(cur_it + 1, cur_it + n):  # pre-step events: none inside
            if apply_overlay(args, it):
                n = it - cur_it
                break
        return max(n, 1)

    def _has_host_event(self, it: int) -> bool:
        """Host-side work is due at/after iteration ``it`` (checkin, LR drop,
        checkpoint, display streaming) — speculation must not run past it,
        because those paths read ``self.z`` at the event iteration."""
        args = self.args
        if it % args.save_every == 0 or it in args.learning_rate_drops:
            return True
        ck = getattr(args, "checkpoint_every", 0)
        if ck and it and it % ck == 0:
            return True
        de = args.display_every
        if de and (it + 1) % de == 0:
            return True
        return False

    def _dispatch_block(self, cur_it: int, n: int, anim_index: int):
        """Run ``n`` steps in one dispatch; results stay on-device (futures)."""
        if self._multi_step is None or self._multi_step[0] != n:
            from pixray_tpu.engine.step import build_multi_step

            fn, _ = build_multi_step(self.step_cfg, self.optimizer, n)
            self._multi_step = (n, fn)
        self.z, self.opt_state, self.key, totals, valss, img = self._multi_step[1](
            self.z, self.opt_state, self.key, cur_it, anim_index, self.lr_scale, self.refs
        )
        return {"start": cur_it, "n": n, "totals": totals, "valss": valss, "img": img}

    def _consume_block(self, cur_it: int, anim_index: int = 0):
        """Pop this iteration's (total, values, img) from the buffer, or None.

        On first consume of a block, (a) the FOLLOWING block is speculatively
        dispatched when no host event interrupts (double buffering: the device
        computes block k+1 while the host walks block k's results), then (b)
        block k's stacked losses are pulled to host in one transfer."""
        b = self._block
        if b is None:
            return None
        idx = cur_it - b["start"]
        if not (0 <= idx < b["n"]):
            self._block = None
            self._next_block = None
            return None
        if idx == 0 and not isinstance(b["totals"], np.ndarray):
            want = self.BLOCK_STEPS if self.args.steps_per_call == 0 else self.args.steps_per_call
            nxt = b["start"] + b["n"]
            if (
                self._next_block is None
                and not self._has_host_event(b["start"] + b["n"] - 1)
                # overlay is a PRE-step event: _block_size(nxt)'s scan starts at
                # nxt+1, so an overlay due exactly at nxt must block speculation
                # (train() would mutate z after this block was dispatched)
                and not apply_overlay(self.args, nxt)
                and self._block_size(nxt) == want
                and want > 1
            ):
                self._next_block = self._dispatch_block(nxt, want, anim_index)
            b["totals"] = np.asarray(b["totals"])
            b["valss"] = np.asarray(b["valss"])
        total = b["totals"][idx]
        values = b["valss"][idx]
        img = b["img"]
        if idx == b["n"] - 1:
            self._block = self._next_block
            self._next_block = None
        return total, values, img

    # ------------------------------------------------------------------ train/run
    def train(self, cur_it: int) -> bool:
        """One optimizer step + host scheduling. Returns False when run should end."""
        args = self.args
        rebuild_opts_when_done = False

        if cur_it < args.iterations:
            if cur_it == 0 and self.init_image_rgba_list and self.cur_anim_index is not None:
                n = len(self.init_image_rgba_list)
                self.reapply_from_image(self.init_image_rgba_list[self.cur_anim_index % n])

            if apply_overlay(args, cur_it):
                if self.cur_anim_index is not None and self.overlay_image_rgba_list:
                    n = len(self.overlay_image_rgba_list)
                    self.overlay_image_rgba = self.overlay_image_rgba_list[self.cur_anim_index % n]
                self.re_average_z()

            anim_index = 0 if self.cur_anim_index is None else self.cur_anim_index
            try:
                buffered = self._consume_block(cur_it, anim_index)
                if buffered is None:
                    n = self._block_size(cur_it)
                    # only full-size blocks run blocked (ONE extra compiled
                    # graph); truncated spans fall back to single steps
                    want = self.BLOCK_STEPS if self.args.steps_per_call == 0 else self.args.steps_per_call
                    if n == want and n > 1:
                        self._block = self._dispatch_block(cur_it, n, anim_index)
                        buffered = self._consume_block(cur_it, anim_index)
                if buffered is not None:
                    total, values, img = buffered
                else:
                    self.key, k_step = jax.random.split(self.key)
                    self.z, self.opt_state, total, values, img = self._step(
                        self.z, self.opt_state, k_step, cur_it, anim_index, self.lr_scale, self.refs
                    )
            except RuntimeError as e:
                # OOM guidance parity (reference pixray.py:1625-1628); jax device
                # OOMs surface as XlaRuntimeError (a RuntimeError subclass) with
                # RESOURCE_EXHAUSTED status
                print("Oops: runtime error:", e)
                if "RESOURCE_EXHAUSTED" in str(e) or "emory" in str(e):
                    print("Try reducing --num_cuts or --batches to save memory")
                raise
            self.last_loss_values = values
            self.last_image = img

            if self.cur_anim_index is None or self.cur_anim_index == 0:
                if cur_it in args.learning_rate_drops:
                    print("Dropping learning rate")
                    rebuild_opts_when_done = True
                else:
                    # best-loss tracking with a one-step lag: syncing `total` every
                    # iteration would stall the device pipeline (jax arrays are
                    # futures); by reading the PREVIOUS step's loss here it is
                    # already materialized and the read is free.
                    if self._pending_loss is not None:
                        p_it, p_total = self._pending_loss
                        did_drop = self.tracker.check(p_it, float(p_total), params=self.z)
                        if args.auto_stop is True:
                            rebuild_opts_when_done = did_drop
                    self._pending_loss = (cur_it, total)

            if cur_it % args.save_every == 0:
                self.checkin(cur_it, values)

            if getattr(args, "checkpoint_every", 0) and cur_it and cur_it % args.checkpoint_every == 0:
                from pixray_tpu.engine.checkpoint import save_session

                save_session(os.path.join(args.outdir, "session.ckpt"), self)

            if args.make_video:
                video_folder = os.path.join(args.outdir, "video")
                os.makedirs(video_folder, exist_ok=True)
                IM.from_tensor(np.asarray(img)[..., :3]).save(
                    f"{video_folder}/frame_{cur_it:04d}.png"
                )

        # vdiff per-step re-noise + fresh optimizer (pixray.py:1489-1495)
        if hasattr(self.drawer, "post_step"):
            new_z = self.drawer.post_step(self.z, cur_it)
            if new_z is not None:
                self.z = new_z
                self._build_optimizer()

        if cur_it == args.iterations:
            self.checkin(cur_it, self.last_loss_values)
            return False
        if rebuild_opts_when_done:
            if not self.tracker.register_drop(cur_it):
                return False
            self.drop_learning_rate()
        return True

    def checkin(self, it: int, values):
        args = self.args
        if values is not None:
            vals = np.asarray(values)
            losses_str = ", ".join(f"{v:2.3g}" for v in vals)
            writestr = f"iter: {it}, loss: {vals.sum():1.3g}, losses: {losses_str}"
        else:
            writestr = f"iter: {it}, finished"
        if self.cur_anim_index is not None:
            writestr = f"anim: {self.cur_anim_index}/{len(self.anim_output_files)} {writestr}"
        else:
            stale = it - self.tracker.best_iter
            writestr = f"{writestr} (-{stale}=>{self.tracker.best_loss:2.4g})"

        img = self.synth_image(it)
        if self.cur_anim_index is None:
            outfile = get_file_path(args.outdir, args.output, ".png")
        else:
            outfile = self.anim_output_files[self.cur_anim_index]
        OUT.save_checkin_png(img, outfile, args.given_args, self.seed_used)

        if args.save_intermediates:
            step_path = os.path.join(args.outdir, "steps")
            os.makedirs(step_path, exist_ok=True)
            img.save(get_file_path(step_path, f"frame_{it:04d}", ".png"))
        if self.cur_anim_index is not None and self.cur_anim_index == len(self.anim_output_files) - 1:
            OUT.make_gif(args.animation_dir)
        _notebook_display(args, it, outfile)
        try:
            from tqdm import tqdm

            tqdm.write(writestr)  # plays nice with the run progress bar (pixray.py:1201)
        except Exception:
            print(writestr)

    def run(self, return_display: bool = False) -> bool:
        """Main loop (reference do_run, pixray.py:1540-1638). Returns True when
        the run is complete; with return_display, returns False every
        display_every iterations so callers can stream partial results."""
        args = self.args
        # blocks must truncate at display boundaries when the caller streams
        # partial results (the buffered image is the block's final frame)
        self._display_streaming = return_display

        if args.animation_dir is not None:
            return self._run_animation()

        from pixray_tpu.engine.profiling import device_trace

        profile_dir = getattr(args, "profile_dir", None) if self.cur_iteration == 0 else None
        try:
            with device_trace(profile_dir, "(start of run)"), _progress_bar() as pbar:
                keep_going = True
                while keep_going:
                    keep_going = self.train(self.cur_iteration)
                    if self.cur_iteration == args.iterations:
                        break
                    self.cur_iteration += 1
                    if pbar is not None:
                        pbar.update()
                    if keep_going and return_display and self.cur_iteration % args.display_every == 0:
                        return False
        except KeyboardInterrupt:
            pass

        if args.make_video:
            OUT.do_video(args, self.cur_iteration)
        if args.save_intermediates:
            OUT.step_to_video(args)
        if getattr(args, "save_svg", False):
            self.save_svg()
        return True

    def save_svg(self):
        """Vector export for drawers that support it (pixel/clipdraw/line_sketch)."""
        try:
            svg = self.drawer.to_svg(self.z)
        except NotImplementedError:
            print(f"drawer {self.args.drawer} has no SVG export")
            return None
        outfile = get_file_path(self.args.outdir, self.args.output, ".svg")
        with open(outfile, "w") as f:
            f.write(svg)
        print(f"saved {outfile}")
        return outfile

    # ------------------------------------------------------------------ animation
    def _anim_filelist(self):
        """Pick the animation frame source list (reference 1552-1569)."""
        args = self.args
        filelist: list[str] = []
        source = None

        def consider(cur_source, cur_list):
            nonlocal source, filelist
            if source is None:
                print(f"==> setting animation filelist to {cur_source} ({len(cur_list)} files)")
                source, filelist = cur_source, cur_list
            elif len(cur_list) > len(filelist):
                print(f"==> anim filelist {cur_source} has {len(cur_list)} files - switching")
                source, filelist = cur_source, cur_list
            else:
                print(f"==> anim filelist {cur_source} not larger - sticking with {source}")

        if args.overlay_image is not None:
            consider("overlay_images", real_glob(args.overlay_image))
        if args.target_images:
            files = []
            for t in args.target_images:
                f1, _w, _s = parse_prompt(t)
                files.extend(real_glob(f1))
            consider("target_images", files)
        if args.init_image is not None:
            consider("init_images", real_glob(args.init_image))
        if args.image_prompts:
            consider("image_prompts", list(args.image_prompts))
        return filelist

    def _run_animation(self) -> bool:
        """Frame-ring training with inter-round alpha blending (reference
        pixray.py:1544-1609)."""
        args = self.args
        os.makedirs(args.animation_dir, exist_ok=True)
        filelist = self._anim_filelist()
        num_frames = len(filelist)
        self.anim_output_files = [
            os.path.join(args.animation_dir, os.path.basename(f)) for f in filelist
        ]
        self.anim_cur_zs = [jax.tree_util.tree_map(jnp.copy, self.z) for _ in range(num_frames)]

        step_iteration = 0
        while True:
            cur_images = []
            for i in range(num_frames):
                self.cur_anim_index = i
                self.cur_iteration = step_iteration
                self.z = self.anim_cur_zs[i]
                for _ in range(args.save_every):
                    self.train(self.cur_iteration)
                    self.cur_iteration += 1
                self.anim_cur_zs[i] = self.z
                cur_images.append(self.synth_image())
            step_iteration += args.save_every
            if step_iteration >= args.iterations:
                break
            # inter-round temporal blending (pixray.py:1600-1609)
            for i in range(num_frames):
                prev_i = (i + num_frames - 1) % num_frames
                base = cur_images[i].copy().convert("RGB")
                prev = cur_images[prev_i].copy().convert("RGBA")
                prev.putalpha(args.animation_alpha)
                base.paste(prev, (0, 0), prev)
                self.reapply_from_image(base)
                self.anim_cur_zs[i] = self.z
        return True
