"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Beyond reference parity (MMF has no pipeline parallelism — SURVEY.md §2.10
marks TP/PP/SP/EP "ABSENT"): stages are laid out across devices on a mesh
axis, the batch is split into microbatches, and activations flow
stage-to-stage with ``jax.lax.ppermute`` neighbor exchanges — the same
SPMD formulation every device runs identically, so the whole pipeline
(including its bubble) lives inside ONE jitted program and XLA overlaps
the ppermute transfers with the next microbatch's compute. No scheduler
process, no send/recv threads: the reference's closest analog would be
torch.distributed P2P pipelining, which MMF never had.

Formulation (classic SPMD pipeline, cf. the public "How to Scale Your
Model" recipe): with N stages and M microbatches the schedule runs
T = M + N - 1 steps. At step t, the device holding stage i computes
microbatch ``t - i`` when ``0 <= t - i < M``; stage 0 feeds from the
input queue, later stages from the ppermute'd output of their neighbor,
and the last stage writes its results into the output buffer. Devices
outside their active window compute garbage that is never written — the
cost of branch-free SPMD — so pipeline efficiency is M / (M + N - 1);
pick M >= 4N to keep the bubble under 25%.

Autodiff: everything inside is scan + ppermute + where, all of which
have transpose rules, so ``jax.grad`` through ``pipeline_apply`` yields
exact gradients (pinned by tests/parallel/test_pipeline.py against the
unpipelined stack).

Usage:
    stacked = stack_stage_params([p0, p1, ..., p{N-1}])   # leading axis N
    y = pipeline_apply(stage_fn, stacked, x, mesh, axis="model",
                       num_microbatches=8)
where ``stage_fn(stage_params, x_mb, *extras_mb) -> y_mb`` maps one
microbatch through one stage and must preserve the activation shape
(true of transformer blocks; project in/out before/after the pipeline).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def _vary(x, axis_names):
    """Mark a replicated value as device-varying over ``axis_names``
    (str or tuple) so scan carries and ``where`` mixes type-check under
    shard_map's varying-axis typing (same dance as
    ops/ring_attention.py)."""
    if isinstance(axis_names, str):
        axis_names = (axis_names,)
    for name in axis_names:
        try:
            x = jax.lax.pcast(x, (name,), to="varying")
        except AttributeError:
            try:
                x = jax.lax.pvary(x, (name,))
            except AttributeError:
                return x
        except ValueError:
            # already varying over this axis (e.g. a data-sharded input
            # under batch_axis) — nothing to add
            pass
    return x


def stack_stage_params(stage_params: Sequence[Any]) -> Any:
    """Stack N per-stage parameter pytrees into one pytree whose leaves
    gain a leading stage axis — the layout ``pipeline_apply`` shards
    over the pipeline mesh axis."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *stage_params
    )


def unstack_stage_params(stacked: Any, n_stages: int) -> list:
    """Inverse of :func:`stack_stage_params` (host-side, for checkpoint
    import/export of per-stage trees)."""
    return [
        jax.tree_util.tree_map(lambda l, i=i: l[i], stacked)
        for i in range(n_stages)
    ]


def stage_params_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sharding that places each stage's slice of the stacked params on
    its pipeline device (leading axis split over ``axis``)."""
    return NamedSharding(mesh, P(axis))


def pipeline_apply(
    stage_fn: Callable,
    stage_params: Any,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    num_microbatches: Optional[int] = None,
    extras: Sequence[jax.Array] = (),
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """Run ``x`` through ``n = mesh.shape[axis]`` pipeline stages.

    stage_params: pytree with leading stage axis of size n (see
        :func:`stack_stage_params`); sharded over ``axis`` internally.
    x: [B, ...] global batch; ``B % num_microbatches == 0``.
    extras: additional batch-leading arrays microbatched alongside ``x``
        and passed to ``stage_fn`` (e.g. an attention-bias tensor).
    batch_axis: mesh axis the batch is data-parallel over (e.g.
        ``"data"`` on a dp x pp mesh). Each data-row of the mesh then
        pipelines only its OWN batch shard — without this, shard_map
        would all-gather the batch and every row would duplicate the
        full-batch work. ``num_microbatches`` applies per shard.
    Returns [B, ...] with the same shape as ``stage_fn``'s output,
    replicated over ``axis`` (sharded over ``batch_axis`` if given).
    """
    n = mesh.shape[axis]
    m = num_microbatches or n
    dp = mesh.shape[batch_axis] if batch_axis else 1
    b = x.shape[0]
    assert b % (m * dp) == 0, (
        f"batch {b} not divisible by {m} microbatches x {dp} data shards"
    )
    mb = b // dp // m

    perm = [(j, (j + 1) % n) for j in range(n)]

    # with a batch_axis the activations vary over BOTH mesh axes (each
    # data row pipelines its own shard), so carries/buffers must be
    # typed varying over both for shard_map's vma checking
    vary_axes = (axis,) + ((batch_axis,) if batch_axis else ())

    def device_fn(params_stk, x_rep, *extras_rep):
        # local slice of the stacked params: leading axis is 1 here
        params = jax.tree_util.tree_map(lambda p: p[0], params_stk)
        idx = jax.lax.axis_index(axis)

        # x_rep is the local batch shard when batch_axis is set
        xs = _vary(x_rep.reshape(m, mb, *x_rep.shape[1:]), vary_axes)
        exs = tuple(
            _vary(e.reshape(m, mb, *e.shape[1:]), vary_axes)
            for e in extras_rep
        )

        def at(buf, t):
            return jax.lax.dynamic_index_in_dim(buf, t, 0, keepdims=False)

        def step(carry, t):
            recv, outs = carry
            t_in = jnp.clip(t, 0, m - 1)
            inp = jnp.where(idx == 0, at(xs, t_in), recv)
            # stage i processes microbatch t - i at step t, so extras
            # (which every stage consumes) index by t - idx
            t_mb = jnp.clip(t - idx, 0, m - 1)
            ex_t = tuple(at(e, t_mb) for e in exs)
            y = stage_fn(params, inp, *ex_t)
            t_out = t - (n - 1)
            write = jnp.logical_and(idx == n - 1, t_out >= 0)
            pos = jnp.clip(t_out, 0, m - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, at(outs, pos)), pos, 0
            )
            send = jax.lax.ppermute(y, axis, perm)
            return (send, outs), None

        # Probe the stage output shape so the buffers match it even if
        # the stage changes dtype.
        y_shape = jax.eval_shape(stage_fn, params, at(xs, 0),
                                 *(at(e, 0) for e in exs))
        assert y_shape.shape == (mb, *x_rep.shape[1:]), (
            f"pipeline stages must preserve activation shape, got "
            f"{y_shape.shape} from {(mb, *x_rep.shape[1:])}"
        )
        recv0 = _vary(jnp.zeros(y_shape.shape, y_shape.dtype), vary_axes)
        outs0 = _vary(
            jnp.zeros((m, *y_shape.shape), y_shape.dtype), vary_axes
        )
        (_, outs), _ = jax.lax.scan(
            step, (recv0, outs0), jnp.arange(m + n - 1)
        )
        # Only the last stage holds real outputs; replicate them.
        outs = jax.lax.psum(
            jnp.where(idx == n - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs.reshape(x_rep.shape[0], *y_shape.shape[1:])

    data_spec = P(batch_axis) if batch_axis else P(None)
    in_specs = [P(axis)] + [data_spec] * (1 + len(extras))
    mapped = _shard_map()(
        device_fn, mesh=mesh,
        in_specs=tuple(in_specs), out_specs=data_spec,
    )
    return mapped(stage_params, x, *extras)


def pipeline_transformer_stage(layer_module, deterministic: bool = True,
                               with_rng: bool = False,
                               axis: str = "model"):
    """Adapter: a flax ``TransformerLayer``-style module as a pipeline
    stage whose stacked params hold ``layers_per_stage`` layers each
    (leaves shaped [n_stages, layers_per_stage, ...]).

    Returns ``stage_fn(stage_params, hidden, bias[, rng_rows])`` that
    scans the stage's layers locally (one stage = a contiguous slab of
    the trunk).

    with_rng: training-mode dropout. The caller microbatches a
    [B, key_size] ``jax.random.key_data`` array where every row of a
    microbatch carries that microbatch's key (see
    TransformerEncoder's pipeline path); the stage derives a distinct
    key per (microbatch, stage, local layer) by folding the stage index
    and layer index into the microbatch key — masks stay independent
    across microbatches and layers, as in the unpipelined trunk.
    """

    def stage_fn(stage_params, hidden, bias, *rest):
        if with_rng:
            (rng_rows,) = rest
            # row 0 of the microbatch block IS the microbatch key; the
            # key-data width identifies the impl (threefry: 2 words,
            # rbg/unsafe_rbg: 4 — the trainer defaults to rbg)
            impl = "threefry2x32" if rng_rows.shape[-1] == 2 else "rbg"
            mb_key = jax.random.wrap_key_data(rng_rows[0], impl=impl)
            stage_idx = jax.lax.axis_index(axis)
        else:
            mb_key = None

        def body(carry, xs):
            h = carry
            if with_rng:
                layer_params, j = xs
                key = jax.random.fold_in(
                    jax.random.fold_in(mb_key, stage_idx), j
                )
                h = layer_module.apply(
                    {"params": layer_params}, h, bias, deterministic,
                    rngs={"dropout": key},
                )
            else:
                layer_params = xs
                h = layer_module.apply(
                    {"params": layer_params}, h, bias, deterministic
                )
            return h, None

        if with_rng:
            n_local = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
            xs = (stage_params, jnp.arange(n_local))
        else:
            xs = stage_params
        hidden, _ = jax.lax.scan(body, hidden, xs)
        return hidden

    return stage_fn


def stack_trunk_layers(params: Any, layer_prefix: str = "layer_",
                       num_layers: Optional[int] = None) -> Any:
    """Re-layout a ``TransformerEncoder`` unrolled-layer param dict
    ({'layer_0': ..., 'layer_1': ...}) into a scan/pipeline layout with
    a leading layer axis. Host-side, checkpoint-conversion style."""
    names = sorted(
        (k for k in params if k.startswith(layer_prefix)),
        key=lambda k: int(k[len(layer_prefix):]),
    )
    if num_layers is not None:
        names = names[:num_layers]
    return stack_stage_params([params[k] for k in names])


def trunk_pipeline_params(params: Any, n_stages: int,
                          layer_prefix: str = "layer_") -> Any:
    """Group a trunk's layers into ``n_stages`` contiguous stage slabs:
    leaves come out [n_stages, layers_per_stage, ...] — the layout
    :func:`pipeline_transformer_stage` consumes."""
    stacked = stack_trunk_layers(params, layer_prefix)  # [L, ...]

    def regroup(leaf):
        l = leaf.shape[0]
        assert l % n_stages == 0, (
            f"{l} layers not divisible into {n_stages} stages"
        )
        return leaf.reshape(n_stages, l // n_stages, *leaf.shape[1:])

    return jax.tree_util.tree_map(regroup, stacked)
