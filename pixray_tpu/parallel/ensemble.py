"""Perceptor-ensemble placement on the mesh's ``model`` axis.

The reference runs up to 5 CLIP/SLIP perceptors SEQUENTIALLY on one GPU
(quality=supreme, /root/reference/pixray.py:1824-1846, 1278-1336) — the ensemble
is embarrassingly parallel (SURVEY.md §2.3).  Here each ensemble member is
placed on its own ``model``-axis device group and every member's cutout batch is
simultaneously split over the ``data`` axis, so a (data=D, model=M) mesh runs M
perceptors concurrently, each D-way data-parallel.

Mechanism (MPMD over SPMD): perceptor towers are heterogeneous (different
resolutions, widths, architectures), so they cannot be stacked and vmapped.
Instead ONE ``shard_map`` program runs on every device and selects its member
with ``lax.switch(lax.axis_index('model'), ...)`` — XLA's conditional executes
only the taken branch, so each device group runs only its own tower.  Per-prompt
loss contributions are computed as local sums over the device's cutout chunk and
``psum``-reduced over both axes; the backward pass transposes through the same
switch, so each group also only runs its own tower's backward.

Transpose-safe member selection: jax's varying-mesh-axes type system types the
output of a switch on ``axis_index`` as INvarying over 'model' (the predicate's
variance is not propagated), which both rejects the downstream psum and — worse
— mis-transposes the switch so every group runs member 0's backward.  Instead
of disabling the checker, ``switch_placed`` wraps the switch in a custom_vjp
that (a) pcasts the output to varying over 'model' inside the custom_vjp (so
the pcast's double-counting transpose never runs), and (b) re-switches on
``axis_index`` in the backward, each branch running its own member's vjp, then
psums the cotangent across the model axis so it is genuinely invarying — the
exact transpose of "replicated operand, per-group branch".  The backward
recomputes the selected member's forward (custom_vjp residuals are the inputs);
that one extra tower forward is the price of a correct, checker-clean
transpose.  tests/test_ensemble.py verifies value AND gradient against the
sequential path on an 8-device CPU mesh.

With P members and M groups, members are assigned round-robin (member p → group
p % M) in ceil(P/M) rounds; per-device FLOPs drop from P towers to ceil(P/M).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from pixray_tpu.ops.grad import l2_normalize, replace_grad
from pixray_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, host_local


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def switch_placed(branches, axis_name, args):
    """``lax.switch`` on a mesh-varying index with a transpose-safe custom VJP.

    ``args`` = (idx, operand); every branch takes ``operand``.  The output is
    pcast to varying over ``axis_name`` INSIDE the custom_vjp, so the checker
    accepts downstream psums while the pcast's own (double-counting) transpose
    is never invoked.  Gradients flow only through ``operand`` — values the
    branches close over are constants to the backward pass.
    """
    idx, operand = args
    out = jax.lax.switch(idx, list(branches), operand)
    return jax.tree_util.tree_map(
        lambda t: jax.lax.pcast(t, axis_name, to="varying"), out
    )


def _switch_placed_fwd(branches, axis_name, args):
    return switch_placed(branches, axis_name, args), args


def _switch_placed_bwd(branches, axis_name, res, g):
    idx, operand = res
    # CONTRACT: callers must consume the switch output in a way that makes its
    # cotangent UNIFORM across `axis_name` (e.g. each branch writes its own
    # statically-indexed rows of a full-size output that is then psum-reduced)
    # — then pmean is a value-preserving downcast from varying to invarying,
    # which the inner vjp's types require.  A downstream op that selects
    # per-group rows with a mesh-varying index would make g per-group distinct
    # and this pmean would silently average the groups' cotangents.
    g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, axis_name), g)

    def branch_vjp(f):
        def run(op):
            _, vjp = jax.vjp(f, op)
            return vjp(g)[0]
        return run

    d_op = jax.lax.switch(idx, [branch_vjp(f) for f in branches], operand)

    # each group computed only its own member's cotangent; the sum across the
    # model axis is the true cotangent of the replicated operand (and is
    # genuinely invarying, which the shard_map transpose demands).  Integer
    # operand leaves carry float0 cotangents — no reduction applies.
    def _reduce(t):
        if t.dtype == jax.dtypes.float0:
            return t
        return jax.lax.psum(jax.lax.pcast(t, axis_name, to="varying"), axis_name)

    d_op = jax.tree_util.tree_map(_reduce, d_op)
    return ((np.zeros(idx.shape, jax.dtypes.float0), d_op),)


switch_placed.defvjp(_switch_placed_fwd, _switch_placed_bwd)


def ensemble_active(mesh, n_perceptors: int) -> bool:
    """Single predicate (used by core.py and step.py) for when member-per-group
    placement engages: a model axis >1 and >1 perceptors.  Image-prompt terms
    run INSIDE the placed program as pair jobs (the prompt-image embeddings are
    all-gathered over the data axis within the member's branch), so their
    presence no longer disables placement."""
    return (
        mesh is not None
        and MODEL_AXIS in mesh.shape
        and int(mesh.shape[MODEL_AXIS]) > 1
        and n_perceptors > 1
    )


@dataclass
class EnsembleMember:
    """Static description of one ensemble member inside the shard_map program."""

    name: str
    image_fn: Callable  # (variables, (n, S, S, C) batch) -> (n, D) embeddings
    out_dim: int


def pad_table(table, l_max: int, d_max: int):
    """Pad a PromptTable to (l_max, d_max) numpy arrays.

    Padding rows have weight 0 (→ sign 0 → zero loss and zero gradient) and stop
    -inf (→ max(0, stop) = 0); embedding rows are zero (l2_normalize is
    eps-guarded, so they stay zero instead of NaN).
    """
    e = np.zeros((l_max, d_max), np.float32)
    w = np.zeros((l_max,), np.float32)
    s = np.full((l_max,), -np.inf, np.float32)
    n, d = int(table.embeds.shape[0]), int(table.embeds.shape[1])
    if n:
        # host_local: table arrays may be replicated over a multi-process mesh
        e[:n, :d] = host_local(table.embeds).astype(np.float32)
        w[:n] = host_local(table.weights).astype(np.float32)
        s[:n] = host_local(table.stops).astype(np.float32)
    return e, w, s


def _partial_pair_loss(x_local, e_all, weight: float, n_total: int):
    """Local-chunk contribution to prompts.single_prompt_loss (image prompts):
    spherical distance over (local-main × ALL-prompt) embedding pairs, divided
    by the GLOBAL pair count so the data-axis psum reproduces the full mean."""
    x = l2_normalize(x_local.astype(jnp.float32), axis=-1)
    e = l2_normalize(e_all.astype(jnp.float32), axis=-1)
    cos = jnp.clip(x @ e.T, -1.0, 1.0)  # (chunk, N)
    chord = jnp.sqrt(jnp.maximum(2.0 - 2.0 * cos, 1e-12))
    dists = jnp.square(jnp.arcsin(chord / 2.0)) * 2.0
    denom = n_total * e_all.shape[0]
    return abs(weight) * jnp.sum(dists) * float(np.sign(weight)) / denom


def _partial_prompt_losses(emb_local, embeds, weights, stops, n_total: int):
    """Local-chunk contribution to the per-prompt losses: identical math to
    prompts.prompt_losses but summed over the local chunk and divided by the
    GLOBAL cutout count, so a psum over the data axis reproduces the mean."""
    d = emb_local.shape[-1]
    x = l2_normalize(emb_local.astype(jnp.float32), axis=-1)
    emb = l2_normalize(embeds[:, :d], axis=-1)
    cos = jnp.clip(x @ emb.T, -1.0, 1.0)  # (chunk, L)
    chord = jnp.sqrt(jnp.maximum(2.0 - 2.0 * cos, 1e-12))
    dists = jnp.square(jnp.arcsin(chord / 2.0)) * 2.0
    dists = dists * jnp.sign(weights)[None, :]
    clamped = replace_grad(dists, jnp.maximum(dists, stops[None, :]))
    return jnp.abs(weights) * jnp.sum(clamped, axis=0) / n_total


def ensemble_scores(
    mesh,
    members: list[EnsembleMember],
    job_batches: dict[str, list],
    job_tables: dict[str, list],
    variables_list,
    want_iii_of: int | None = None,
    pair_jobs: dict[str, tuple[list, list]] | None = None,
):
    """Score every (member, job) pair with one ensemble member per model group.

    job_batches: {kind: [per-member (N, S_m, S_m, C) cutout batch]} — replicated
      arrays; N must be a multiple of the mesh's data-axis size.
    job_tables: {kind: [per-member PromptTable]} — one table per member per kind.
    variables_list: per-member weight pytrees (replicated; every device holds all
      members, only its own is read — same memory as the sequential path).
    want_iii_of: member index whose 'main' embeddings (N, D) to return (the
      engine's ``embeds`` global for the aesthetic loss), or None.
    pair_jobs: {kind: ([per-member batch], [per-member static weight])} —
      image-prompt terms (reference pixray.py:1308-1336): the member's batch is
      encoded, all-gathered over the data axis, and paired all-to-all with the
      member's LOCAL 'main' embeddings (prompts.single_prompt_loss semantics).
      A member with weight 0.0 skips the encode entirely.

    Returns ({kind: (P, Lmax_kind) padded per-prompt loss values, plus a (P, 1)
    entry per pair kind}, iii or None).
    """
    pair_jobs = pair_jobs or {}
    P = len(members)
    M = int(mesh.shape[MODEL_AXIS])
    D = int(mesh.shape[DATA_AXIS])
    kinds = [k for k, tables in job_tables.items() if any(t.size for t in tables)]
    pair_kinds = [k for k, (_, ws) in pair_jobs.items() if any(w != 0.0 for w in ws)]
    pair_weights = {k: [float(w) for w in pair_jobs[k][1]] for k in pair_kinds}
    n_total = int(job_batches["main"][0].shape[0])
    assert n_total % D == 0, "cutout count must be padded to the data-axis size"
    chunk = n_total // D
    d_max = max(m.out_dim for m in members)
    l_max = {k: max(t.size for t in job_tables[k]) for k in kinds}
    l_max.update({k: 1 for k in pair_kinds})
    out_kinds = kinds + pair_kinds
    rounds = -(-P // M)

    # stacked padded tables: {kind: (P, Lmax, d_max) / (P, Lmax) / (P, Lmax)}
    tables_dev = {}
    for k in kinds:
        packed = [pad_table(t, l_max[k], d_max) for t in job_tables[k]]
        tables_dev[k] = tuple(jnp.asarray(np.stack(a)) for a in zip(*packed))

    # kinds may alias batches (main/target score the same cutouts): dedupe here,
    # BEFORE shard_map flattens the pytree into distinct tracers, so each unique
    # batch is encoded exactly once per member
    unique_batches: list = []
    kind_to_slot: dict[str, list[int]] = {}
    all_job_batches = dict(job_batches)
    all_job_batches.update({k: pair_jobs[k][0] for k in pair_kinds})
    # 'main' is always slot-mapped (even when its tables are empty) so the iii
    # request and pair jobs can encode it
    for k in dict.fromkeys(["main", *kinds, *pair_kinds]):
        slots = []
        for b in all_job_batches[k]:
            for si, u in enumerate(unique_batches):
                if u is b:
                    slots.append(si)
                    break
            else:
                unique_batches.append(b)
                slots.append(len(unique_batches) - 1)
        kind_to_slot[k] = slots
    batches_in = tuple(unique_batches)

    def scored(batches, tables, variables):
        m_idx = jax.lax.axis_index(MODEL_AXIS)
        d_idx = jax.lax.axis_index(DATA_AXIS)

        # every traced value a branch uses MUST ride in the operand: branches
        # are re-invoked inside switch_placed's backward trace, where values
        # closed over from this trace would be leaked tracers.  Each branch
        # returns FULL (P, Lmax) row matrices with only its member's row (a
        # static index) written: the downstream consumption is then a plain
        # sum+psum, so the switch output's cotangent is uniform across the
        # model axis — the contract switch_placed's backward requires.
        def zero_branch(op):
            return tuple(
                jax.lax.pcast(
                    jnp.zeros((P, l_max[k]), jnp.float32), DATA_AXIS, to="varying"
                )
                for k in out_kinds
            )

        def member_branch(p):
            def fn(op):
                di, bts, tbls, vrs = op
                vals = []
                emb_cache: dict[int, Any] = {}  # slot -> embeddings, encode once

                def get_emb(slot):
                    if slot not in emb_cache:
                        local = jax.lax.dynamic_slice_in_dim(
                            bts[slot], di * chunk, chunk, 0
                        )
                        emb_cache[slot] = members[p].image_fn(vrs[p], local)
                    return emb_cache[slot]

                for k in kinds:
                    emb = get_emb(kind_to_slot[k][p])
                    e, w, s = tbls[k]
                    row = _partial_prompt_losses(emb, e[p], w[p], s[p], n_total)
                    vals.append(jnp.zeros((P, l_max[k]), jnp.float32).at[p].set(row))
                for k in pair_kinds:
                    w = pair_weights[k][p]
                    if w == 0.0:
                        vals.append(
                            jax.lax.pcast(
                                jnp.zeros((P, 1), jnp.float32), DATA_AXIS, to="varying"
                            )
                        )
                        continue
                    x_loc = get_emb(kind_to_slot["main"][p])  # (chunk, d)
                    e_loc = get_emb(kind_to_slot[k][p])  # (chunk, d)
                    # all-to-all pairing needs cross-chunk pairs: gather the
                    # prompt-image embeddings (tiny: N×d) over the data axis —
                    # the one extra collective of the image-prompt term
                    e_all = jax.lax.all_gather(e_loc, DATA_AXIS, axis=0, tiled=True)
                    val = _partial_pair_loss(x_loc, e_all, w, n_total)
                    vals.append(jnp.zeros((P, 1), jnp.float32).at[p, 0].set(val))
                return tuple(vals)
            return fn

        operand = (d_idx, batches, tables, variables)
        acc_vals = {k: jnp.zeros((P, l_max[k]), jnp.float32) for k in out_kinds}
        for r in range(rounds):
            branches = tuple(
                member_branch(r * M + m) if r * M + m < P else zero_branch
                for m in range(M)
            )
            vals = switch_placed(branches, MODEL_AXIS, (m_idx, operand))
            for i, k in enumerate(out_kinds):
                acc_vals[k] = acc_vals[k] + vals[i]

        return {k: jax.lax.psum(v, (DATA_AXIS, MODEL_AXIS)) for k, v in acc_vals.items()}

    from jax.sharding import PartitionSpec as Pspec

    for k in pair_kinds:
        for b in pair_jobs[k][0]:
            assert int(b.shape[0]) == n_total, (
                f"pair job {k}: batch size {b.shape[0]} != main {n_total}"
            )

    mapped = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(Pspec(), Pspec(), Pspec()),
        out_specs={k: Pspec() for k in out_kinds},
    )(scored)
    out_vals = mapped(batches_in, tables_dev, tuple(variables_list))

    # the requested member's main-batch embeddings (engine "embeds" global for
    # the aesthetic loss) are computed OUTSIDE the placed program, replicated:
    # routing them through the shard_map trips a jax residual-sharding assertion
    # under vjp, and they are only needed when an embeds-consuming custom loss
    # is active (the engine passes want_iii_of=None otherwise)
    iii = None
    if want_iii_of is not None:
        p = want_iii_of
        iii = members[p].image_fn(
            variables_list[p], job_batches["main"][p]
        ).astype(jnp.float32)
    return out_vals, iii
