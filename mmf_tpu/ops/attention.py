"""Fused multi-head attention for TPU: one Pallas flash-attention kernel
family shared by every transformer in the zoo.

This single kernel serves (per SURVEY.md §7.6):
  - single-stream self-attention (VisualBERT / ViLT / MMBT / M4C-MMT),
  - two-stream co-attention (ViLBERT: same kernel, q from one stream,
    k/v from the other, asymmetric seq lens),
  - prefix-LM masked decoding (M4C: causal mask on the decoder span,
    delivered as an additive bias).

Design notes (TPU-first):
  - blockwise online-softmax (flash-attention) over the kv axis, so the
    [Sq, Skv] score matrix never hits HBM;
  - f32 accumulation on the MXU regardless of input dtype (bf16 in, bf16
    out, f32 partials);
  - additive bias (padding + structural masks) broadcast over heads —
    at BERT-scale seq lens (<=512) the [B, 1, Sq, Skv] bias is tiny;
  - backward pass = rematerialized XLA attention (inference is the
    headline metric; the recompute VJP keeps training memory at flash
    levels while XLA's fused softmax-backward handles the FLOPs).

Reference behavior being replaced: torch SDPA inside BertSelfAttentionJit
(reference mmf/modules/hf_layers.py:138-215) and BertBiAttention
(mmf/models/vilbert.py:347-475).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlibs; interpret mode needs pl only
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path (correctness baseline + backward recompute)
# ---------------------------------------------------------------------------
def _logits_dtype(q: jax.Array):
    """Storage dtype for the materialized [B,H,Sq,Skv] logits.

    Attention here is HBM-bound on this tensor (measured on v5e at
    B=64,H=12,S=228,D=64: 2008us with f32 logits vs 1619us with bf16 —
    ~20% of attention time is logit traffic). When the compute dtype is
    already bf16, storing logits in bf16 adds only ~1 ulp of output noise
    (max 1.6e-2 at bf16 resolution, mean 3e-4) because the softmax still
    reduces in f32. f32 inputs keep f32 logits, so the exact-parity path
    is untouched. Override with MMF_TPU_ATTENTION_LOGITS=f32|bf16.
    """
    import os

    forced = os.environ.get("MMF_TPU_ATTENTION_LOGITS", "").lower()
    if forced == "f32":
        return jnp.float32
    if forced == "bf16":
        return jnp.bfloat16
    return jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain XLA attention. q: [B,H,Sq,D], k/v: [B,H,Skv,D],
    bias: broadcastable to [B,H,Sq,Skv] (additive, -inf style masking).

    dropout_rate/dropout_rng: attention-probability dropout (reference
    BertSelfAttention applies ``self.dropout(attention_probs)``,
    hf_layers.py:138-215); active only when both are provided."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    ldt = _logits_dtype(q)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=ldt
    )
    logits = logits * jnp.asarray(scale, ldt)
    if bias is not None:
        logits = logits + bias.astype(ldt)
    # softmax always reduces in f32 (upcast fuses into the consumer)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, probs.shape
        )
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------
def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_out_ref, l_out_ref,
                  acc_ref, m_ref, l_ref, *, scale, num_kv_blocks,
                  raw_stats=False):
    """One (batch, head, q-block, kv-block) grid step of the online
    softmax. The kv dimension is the innermost ("arbitrary") grid axis,
    so Pallas double-buffers the K/V block DMAs against compute; the
    running (acc, m, l) state lives in VMEM scratch that persists
    across the kv steps of one q block.

    q_ref: [block_q, d]; k_ref/v_ref: [block_k, d]; bias_ref:
    [block_q | 1, block_k] or None; o_ref: [block_q, d];
    m_out_ref/l_out_ref: [block_q, 128] lane-replicated row max /
    normalizer for the backward (None on inference-only calls) — saved
    SEPARATELY, not as lse = m + log(l): at the framework's
    -0.7*f32max mask constant, |m| for a fully masked row is ~2.4e38
    where one ulp is ~2e31, so the +log(l) term would be absorbed and
    the backward's probabilities would come out unnormalized.
    """
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...].astype(jnp.float32) * scale
    kb = k_ref[...].astype(jnp.float32)
    vb = v_ref[...].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, block_k]
    if bias_ref is not None:
        s = s + bias_ref[...].astype(jnp.float32)

    m_prev = m_ref[...][:, :1]  # [bq, 1]
    l_prev = l_ref[...][:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == num_kv_blocks - 1)
    def _finish():
        l = l_ref[...][:, :1]
        if raw_stats:
            # ring-attention building block: emit the UNNORMALIZED
            # accumulator plus raw (m, l) so the caller can merge this
            # block's online-softmax state with other ring steps'. A
            # fully-masked row keeps its raw (m=finite mask scale, l>0)
            # state — the caller's finite-mask merge semantics match the
            # jnp ring path exactly.
            m_out_ref[...] = m_ref[...]
            l_out_ref[...] = l_ref[...]
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)
            return
        if m_out_ref is not None:
            # l == 0 (true -inf masking across a whole row): park m at
            # 0 / l at 1 so the backward's exp(s - m)/l is exactly 0
            m_out_ref[...] = jnp.broadcast_to(
                jnp.where(l == 0.0, 0.0, m_ref[...][:, :1]),
                m_out_ref.shape,
            )
            l_out_ref[...] = jnp.broadcast_to(
                jnp.where(l == 0.0, 1.0, l), l_out_ref.shape
            )
        # fully masked rows (l == 0) emit zeros
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_ref[...] / l).astype(o_ref.dtype)


def _pad_inputs(q, k, v, bias, block_q, block_k):
    """Shared fwd/bwd padding: head_dim -> 128 lanes, seq lens -> block
    multiples, bias broadcast to concrete [B, Hb, Sq_pad, Skv_pad] with
    padded kv columns hard-masked. Returns the padded operands plus the
    geometry tuple."""
    b, h, sq, d = q.shape
    skv = k.shape[2]

    # Mosaic tiling: a block's lane (last) dim must be 128-divisible OR
    # equal to the full array dim. head_dim is its own full dim in every
    # spec here, so 64 passes through unpadded (Mosaic pads registers
    # internally at the same MXU utilization) — zero-padding to 128
    # would DOUBLE every gemm's FLOPs and HBM traffic (measured 2x
    # kernel time at S=512-2048). Only truly irregular head dims pad.
    d_pad = d if d % 8 == 0 else _round_up(d, 128)
    if d_pad != d:
        dpad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        q = jnp.pad(q, dpad)
        k = jnp.pad(k, dpad)
        v = jnp.pad(v, dpad)

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)

    if sq_pad != sq or skv_pad != skv:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
    if skv_pad != skv:
        # padded kv columns are excluded EXACTLY with true -inf: the
        # finite mask constant would let them join the softmax of rows
        # the user masked entirely (row max == mask value), skewing the
        # normalizer vs the XLA path. exp(-inf - m) == 0 for any finite
        # m, and a pure-padding block can't exist (padding < block_k),
        # so the row max never becomes -inf by padding alone.
        if bias is None:
            bias = jnp.zeros((b, 1, 1, skv), jnp.float32)
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, 0), (0, skv_pad - skv)),
            constant_values=float("-inf"),
        )
    if bias is not None:
        # broadcast to concrete [B, Hb, Sq_b, Skv_pad] (Hb in {1, h}).
        # A padding-mask bias keeps Sq_b = 1 — materializing the q dim
        # would stream a full [Sq, Skv] f32 bias from HBM per head
        # (268 MB at B=16, S=2048), swamping the kernel; the row
        # broadcasts inside the block instead.
        hb = bias.shape[1]
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32), (b, hb, bias.shape[2], skv_pad)
        )
        if bias.shape[2] not in (1, sq_pad):
            bias = jnp.pad(
                bias, ((0, 0), (0, 0), (0, sq_pad - bias.shape[2]), (0, 0))
            )
    geom = (b, h, sq, skv, d, d_pad, sq_pad, skv_pad, block_q, block_k)
    return q, k, v, bias, geom


def _grid_params(interpret):
    """compiler_params pinning the kv axis as sequential ("arbitrary")
    and the rest parallel — lets Mosaic pipeline K/V block DMAs while
    keeping the scratch carry legal. Interpret mode takes none."""
    if interpret or pltpu is None:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        )
    }


def _flash_forward(q, k, v, bias, scale, block_q, block_k, interpret,
                   with_lse=False, raw_stats=False):
    if raw_stats:
        with_lse = True
    q, k, v, bias, geom = _pad_inputs(q, k, v, bias, block_q, block_k)
    b, h, sq, skv, d, d_pad, sq_pad, skv_pad, block_q, block_k = geom

    num_kv = skv_pad // block_k
    grid = (b, h, sq_pad // block_q, num_kv)
    kernel = functools.partial(
        _flash_kernel, scale=scale, num_kv_blocks=num_kv,
        raw_stats=raw_stats,
    )

    q_spec = pl.BlockSpec(
        (1, 1, block_q, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)
    )
    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q, k, v]
    def _out_struct(shape, dtype):
        # inside shard_map (ring attention) the outputs are varying over
        # the same mesh axes as the inputs; check_vma requires saying so
        try:
            vma = frozenset().union(
                *(jax.core.get_aval(x).vma for x in (q, k, v))
            )
        except AttributeError:  # older jax: no vma typing
            vma = None
        if vma:
            return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
        return jax.ShapeDtypeStruct(shape, dtype)

    out_specs = [q_spec]
    out_shapes = [_out_struct(
        (b, h, sq_pad, d_pad), jnp.float32 if raw_stats else q.dtype
    )]
    if with_lse:
        row_spec = pl.BlockSpec(
            (1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        )
        row_shape = _out_struct((b, h, sq_pad, 128), jnp.float32)
        out_specs += [row_spec, row_spec]
        out_shapes += [row_shape, row_shape]
    scratch = [
        pltpu.VMEM((block_q, d_pad), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
    ]

    def _row_refs(refs):
        if with_lse:
            return refs[1].at[0, 0], refs[2].at[0, 0]
        return None, None

    n_out = 3 if with_lse else 1
    if bias is not None:
        hb = bias.shape[1]
        sq_b = bias.shape[2]  # 1 (padding-mask row) or sq_pad (full)
        bq_b = 1 if sq_b == 1 else block_q
        b_spec = pl.BlockSpec(
            (1, 1, bq_b, block_k),
            lambda bi, hi, qi, ki: (
                bi, hi if hb > 1 else 0, 0 if sq_b == 1 else qi, ki
            ),
        )
        in_specs.append(b_spec)
        args.append(bias)

        def wrapped(qr, kr, vr, br, *rest):
            out_refs, scr = rest[:n_out], rest[n_out:]
            kernel(qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], br.at[0, 0],
                   out_refs[0].at[0, 0], *_row_refs(out_refs), *scr)
    else:
        def wrapped(qr, kr, vr, *rest):
            out_refs, scr = rest[:n_out], rest[n_out:]
            kernel(qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], None,
                   out_refs[0].at[0, 0], *_row_refs(out_refs), *scr)

    outs = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shapes if with_lse else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
        **_grid_params(interpret),
    )(*args)

    out, m, l = (outs if with_lse else (outs, None, None))
    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    if with_lse:
        return out, m, l
    return out


# ---------------------------------------------------------------------------
# Pallas flash backward: blockwise dq / dk / dv
# ---------------------------------------------------------------------------
def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, m_ref,
                         l_ref, delta_ref, dq_ref, acc_ref, *, scale,
                         num_kv_blocks):
    """One (batch, head, q-block, kv-block) grid step:
    dq = scale * sum_k ds @ K, accumulated in VMEM scratch over the
    innermost kv axis.

    q/do/dq: [block_q, d]; k/v: [block_k, d]; bias: [block_q | 1,
    block_k]; m/l/delta: [block_q, 128] lane-replicated.
    p = exp(s - m) / l; ds = p * (dO V^T - delta).
    """
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    m = m_ref[...][:, :1]  # [bq, 1]
    linv = 1.0 / l_ref[...][:, :1]
    delta = delta_ref[...][:, :1]
    kb = k_ref[...].astype(jnp.float32)
    vb = v_ref[...].astype(jnp.float32)

    s = jax.lax.dot_general(
        q * scale, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias_ref is not None:
        s = s + bias_ref[...].astype(jnp.float32)
    p = jnp.exp(s - m) * linv
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    acc_ref[...] += jax.lax.dot_general(
        ds, kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_kv_blocks - 1)
    def _finish():
        dq_ref[...] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, m_ref,
                          l_ref, delta_ref, dk_ref, dv_ref, dk_acc_ref,
                          dv_acc_ref, *, scale, num_q_blocks):
    """One (batch, head, kv-block, q-block) grid step:
    dv = sum_q P^T dO;  dk = scale * sum_q ds^T Q — accumulated in VMEM
    scratch over the innermost q axis.

    k/v/dk/dv: [block_k, d]; q/do: [block_q, d]; bias: [block_q | 1,
    block_k]; m/l/delta: [block_q, 128] lane-replicated.
    """
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    kb = k_ref[...].astype(jnp.float32)
    vb = v_ref[...].astype(jnp.float32)
    qb = q_ref[...].astype(jnp.float32)
    dob = do_ref[...].astype(jnp.float32)
    m = m_ref[...][:, :1]
    linv = 1.0 / l_ref[...][:, :1]
    delta = delta_ref[...][:, :1]

    s = jax.lax.dot_general(
        qb * scale, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, block_k]
    if bias_ref is not None:
        s = s + bias_ref[...].astype(jnp.float32)
    p = jnp.exp(s - m) * linv
    dv_acc_ref[...] += jax.lax.dot_general(
        p, dob, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_k, d]
    dp = jax.lax.dot_general(
        dob, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dk_acc_ref[...] += jax.lax.dot_general(
        ds, qb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_k, d]

    @pl.when(qi == num_q_blocks - 1)
    def _finish():
        dk_ref[...] = (dk_acc_ref[...] * scale).astype(dk_ref.dtype)
        dv_ref[...] = dv_acc_ref[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, bias, out, m, l, g, scale, block_q, block_k,
                    interpret):
    """Blockwise flash backward: the [Sq, Skv] probability matrix is
    rebuilt one block at a time from the saved row max m / normalizer l
    — never materialized. delta = rowsum(dO * O) is a cheap fused XLA
    elementwise reduce."""
    orig_dtypes = (q.dtype, k.dtype, v.dtype)
    b, h, sq, d = q.shape
    skv = k.shape[2]

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, H, Sq]

    q, k, v, bias, geom = _pad_inputs(q, k, v, bias, block_q, block_k)
    b, h, sq, skv, d, d_pad, sq_pad, skv_pad, block_q, block_k = geom
    if g.shape[2] != sq_pad or g.shape[3] != d_pad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, sq_pad - g.shape[2]),
                        (0, d_pad - g.shape[3])))
    if delta.shape[2] != sq_pad:
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - delta.shape[2])))
    # row stats ride in the same lane-replicated [.., 128] layout as the
    # forward's m/l outputs (Mosaic tiling); XLA materializes the
    # broadcast once
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))
    # m and l come back from the forward already at sq_pad length; pad
    # rows carry l from the kernel (>= 1 wherever bias kept any column,
    # 1 via the masked-row sentinel otherwise) so 1/l is always finite

    num_q = sq_pad // block_q
    num_kv = skv_pad // block_k
    hb = bias.shape[1] if bias is not None else 1
    sq_b = bias.shape[2] if bias is not None else 0
    bias_rows = sq_b == 1  # padding-mask row kept un-broadcast over q

    # grid (b, h, qi, ki): q-indexed blocks constant over the inner axis
    q_spec = pl.BlockSpec((1, 1, block_q, d_pad),
                          lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, d_pad),
                           lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    row_q_spec = pl.BlockSpec(
        (1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
    )
    # grid (b, h, ki, qi) for the dkv pass: axes 2/3 swap roles
    q_spec_T = pl.BlockSpec((1, 1, block_q, d_pad),
                            lambda bi, hi, ki, qi: (bi, hi, qi, 0))
    kv_spec_T = pl.BlockSpec((1, 1, block_k, d_pad),
                             lambda bi, hi, ki, qi: (bi, hi, ki, 0))
    row_q_spec_T = pl.BlockSpec(
        (1, 1, block_q, 128), lambda bi, hi, ki, qi: (bi, hi, qi, 0)
    )

    # ---- dq: scratch-accumulated over the inner kv axis ---------------
    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, num_kv_blocks=num_kv
    )
    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, 1 if bias_rows else block_q, block_k),
            lambda bi, hi, qi, ki: (
                bi, hi if hb > 1 else 0, 0 if bias_rows else qi, ki
            ),
        ))
        args.append(bias)
    in_specs += [q_spec, row_q_spec, row_q_spec, row_q_spec]
    args += [g, m, l, delta]

    def dq_wrapped(qr, kr, vr, *rest):
        if bias is not None:
            br, dor, mr, lr, deltar, dqr, acc = rest
            br = br.at[0, 0]
        else:
            dor, mr, lr, deltar, dqr, acc = rest
            br = None
        dq_kernel(qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], br,
                  dor.at[0, 0], mr.at[0, 0], lr.at[0, 0],
                  deltar.at[0, 0], dqr.at[0, 0], acc)

    dq = pl.pallas_call(
        dq_wrapped,
        grid=(b, h, num_q, num_kv),
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        interpret=interpret,
        **_grid_params(interpret),
    )(*args)

    # ---- dk, dv: scratch-accumulated over the inner q axis ------------
    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, num_q_blocks=num_q
    )
    in_specs = [q_spec_T, kv_spec_T, kv_spec_T]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, 1 if bias_rows else block_q, block_k),
            lambda bi, hi, ki, qi: (
                bi, hi if hb > 1 else 0, 0 if bias_rows else qi, ki
            ),
        ))
        args.append(bias)
    in_specs += [q_spec_T, row_q_spec_T, row_q_spec_T, row_q_spec_T]
    args += [g, m, l, delta]

    def dkv_wrapped(qr, kr, vr, *rest):
        if bias is not None:
            br, dor, mr, lr, deltar, dkr, dvr, dka, dva = rest
            br = br.at[0, 0]
        else:
            dor, mr, lr, deltar, dkr, dvr, dka, dva = rest
            br = None
        dkv_kernel(qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], br,
                   dor.at[0, 0], mr.at[0, 0], lr.at[0, 0],
                   deltar.at[0, 0], dkr.at[0, 0], dvr.at[0, 0], dka, dva)

    dk, dv = pl.pallas_call(
        dkv_wrapped,
        grid=(b, h, num_kv, num_q),
        in_specs=in_specs,
        out_specs=[kv_spec_T, kv_spec_T],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        interpret=interpret,
        **_grid_params(interpret),
    )(*args)

    dq = dq[:, :, :sq, :].astype(orig_dtypes[0])
    dk = dk[:, :, :skv, :].astype(orig_dtypes[1])
    dv = dv[:, :, :skv, :].astype(orig_dtypes[2])
    if d_pad != d:
        dq, dk, dv = dq[..., :d], dk[..., :d], dv[..., :d]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry with Pallas blockwise VJP
# ---------------------------------------------------------------------------
def _bwd_impl() -> str:
    """"pallas" (default): blockwise dq/dk/dv kernels from the saved LSE
    — O(S) memory end to end, the long-sequence training path.
    "remat": rematerialize through XLA attention (materializes the
    [Sq,Skv] probs in the backward; can win at short seq lens where
    XLA's fused softmax-backward is near-roofline).
    Override with MMF_TPU_FLASH_BWD=pallas|remat."""
    import os

    env = os.environ.get("MMF_TPU_FLASH_BWD", "").lower()
    return env if env in ("pallas", "remat") else "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret):
    return _flash_forward(q, k, v, bias, scale, block_q, block_k, interpret)


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    if _bwd_impl() == "remat":
        out = _flash_forward(
            q, k, v, bias, scale, block_q, block_k, interpret
        )
        return out, (q, k, v, bias, None, None, None)
    out, m, l = _flash_forward(
        q, k, v, bias, scale, block_q, block_k, interpret, with_lse=True
    )
    return out, (q, k, v, bias, out, m, l)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, bias, out, m, l = res
    if m is None:  # remat mode: fused XLA softmax backward
        def f(q, k, v, bias):
            return mha_reference(q, k, v, bias, scale)

        _, vjp = jax.vjp(f, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
        if bias is None:
            dbias = None
        return dq, dk, dv, dbias

    dq, dk, dv = _flash_backward(
        q, k, v, bias, out, m, l, g, scale, block_q, block_k, interpret
    )
    # bias is a padding/structural MASK everywhere in this framework —
    # treated as a constant (its cotangent would require materializing
    # the [Sq,Skv] ds matrix, defeating flash memory). Learned-bias
    # models must use impl="xla" (dot_product_attention docstring).
    dbias = jnp.zeros_like(bias) if bias is not None else None
    return dq, dk, dv, dbias


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with [B,H,S,D] layout and optional additive bias.

    Default blocks 512x1024 (auto-clamped to the padded seq lens):
    measured on v5e (B=16,H=12,D=64,bf16, S=2048) the block sweep runs
    128x128 29.5ms -> 256x512 8.5ms -> 512x1024 4.3ms -> 512x2048 3.6ms
    forward — the MXU wants deep contractions and few grid steps; tiny
    blocks are latency-bound. See BENCH_NOTES "Flash crossover"."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret)


def flash_attention_block(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Ring-attention building block: flash attention over ONE K/V block
    that returns the raw online-softmax state instead of the normalized
    output.

    Returns ``(acc, m, l)`` with acc [B,H,Sq,D] float32 = sum_k
    exp(s - m) @ v (UNNORMALIZED), m [B,H,Sq] float32 = running row max
    of the scaled scores (+bias), l [B,H,Sq] float32 = sum_k exp(s - m).
    The caller merges states across blocks with the standard recurrence
    (ops/ring_attention.py): m' = max(m1, m2); acc' = acc1*e^(m1-m') +
    acc2*e^(m2-m'); l' likewise; final out = acc'/l'.

    Forward-only (no VJP): ring_attention wraps the merged result in a
    custom_vjp whose backward recomputes via the jnp path.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    acc, m, l = _flash_forward(
        q, k, v, bias, scale, block_q, block_k, interpret, raw_stats=True
    )
    sq, d = q.shape[2], q.shape[3]
    acc = acc[:, :, :sq, :d]
    m = m[:, :, :sq, 0]
    l = l[:, :, :sq, 0]
    return acc, m, l


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# Per-seq-len crossover, measured on v5e (tools/benchmarks/
# bench_flash_bwd.py, B=16,H=12,D=64, bf16, 512x1024+ blocks):
#   S=228/256: XLA 639us fwd vs pallas 1514 — XLA wins (fused attention
#              near-roofline at BERT scale, pallas grid overhead shows)
#   S=512:  fwd 511 vs 596 pallas ahead; fwd+bwd 1721 vs 1588 — XLA
#           still ahead with the backward included
#   S=1024: fwd 1343 vs 2432, fwd+bwd 4567 vs 7826 — pallas 1.7x
#   S=2048: fwd 3645 vs 10278, fwd+bwd 13390 vs 30434 — pallas 2.3-2.8x
# plus O(S) memory vs XLA's materialized [B,H,S,S] probs. The auto
# default switches on max seq len — with SEPARATE fwd / fwd+bwd
# thresholds, since the bwd crossover sits a regime later (the dq/dkv
# kernels re-stream K/V and pay two more gemms per block).
# MMF_TPU_ATTENTION=pallas|xla pins the impl outright.
PALLAS_MIN_SEQ = 512          # inference/eval (forward only)
PALLAS_MIN_SEQ_BWD = 1024     # training (forward + backward)


def _int_env(name: str, default: int) -> int:
    import os

    env = os.environ.get(name, "")
    if not env:
        return default
    try:
        return int(env)
    except ValueError:
        import warnings

        warnings.warn(
            f"{name}={env!r} is not an integer; "
            f"falling back to the default {default}"
        )
        return default


@functools.lru_cache(maxsize=1)
def _pallas_min_seq() -> int:
    """Forward-only crossover threshold for the auto dispatch; override
    with MMF_TPU_PALLAS_MIN_SEQ (crossover table in BENCH_NOTES.md)."""
    return _int_env("MMF_TPU_PALLAS_MIN_SEQ", PALLAS_MIN_SEQ)


@functools.lru_cache(maxsize=1)
def _pallas_min_seq_bwd() -> int:
    """fwd+bwd crossover threshold (training call sites pass train=True);
    override with MMF_TPU_PALLAS_MIN_SEQ_BWD. Defaults to the measured
    v5e bwd crossover (1024 — Pallas loses fwd+bwd at 512)."""
    return _int_env("MMF_TPU_PALLAS_MIN_SEQ_BWD", PALLAS_MIN_SEQ_BWD)


@functools.lru_cache(maxsize=1)
def default_impl() -> str:
    """"auto" (seq-len crossover, see PALLAS_MIN_SEQ) unless pinned via
    MMF_TPU_ATTENTION=pallas|xla|pallas_interpret."""
    import os

    env = os.environ.get("MMF_TPU_ATTENTION", "")
    if env in ("pallas", "xla", "pallas_interpret"):
        return env
    return "auto"


@functools.lru_cache(maxsize=1)
def _warn_dropout_xla_once() -> None:
    logging.getLogger(__name__).info(
        "attention-probs dropout is active: routing attention through "
        "the XLA path (the flash kernel never materializes probabilities "
        "to drop). Set attention_probs_dropout_prob=0.0 to use the "
        "Pallas kernel during training."
    )


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Framework-wide attention entry point. [B,H,S,D] layout.

    impl: None (auto: XLA below the measured v5e crossover, the Pallas
    flash kernel at/above — PALLAS_MIN_SEQ for forward-only calls,
    PALLAS_MIN_SEQ_BWD when ``train=True`` since the backward crossover
    sits a regime later), "pallas", "pallas_interpret" (tests), or
    "xla".
    train: the call will be differentiated (a training step) — selects
    the fwd+bwd crossover threshold in auto mode.
    dropout_rate/dropout_rng: attention-probs dropout (train only); the
    flash kernel has no probs to drop, so active dropout always routes
    through the XLA path (logged once).
    """
    if impl is None:
        impl = default_impl()
    if impl == "auto":
        on_tpu = _on_tpu()
        min_seq = _pallas_min_seq_bwd() if train else _pallas_min_seq()
        long_seq = max(q.shape[2], k.shape[2]) >= min_seq
        impl = "pallas" if (on_tpu and long_seq) else "xla"
    if dropout_rate > 0.0 and dropout_rng is not None:
        if impl != "xla":
            _warn_dropout_xla_once()
        return mha_reference(q, k, v, bias, scale, dropout_rate, dropout_rng)
    if impl == "xla":
        return mha_reference(q, k, v, bias, scale)
    if impl == "pallas_interpret":
        return flash_attention(q, k, v, bias, scale, interpret=True)
    return flash_attention(q, k, v, bias, scale)


def make_attention_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, Skv] {0,1} padding mask -> additive bias [B, 1, 1, Skv].

    Parity with the reference's extended attention mask ((1-m) * -10000,
    visual_bert.py:94-106) but with a proper -inf-scale constant so masked
    positions are exactly zero-probability under online softmax.
    """
    mask = mask.astype(jnp.float32)
    bias = (1.0 - mask) * DEFAULT_MASK_VALUE
    return bias[:, None, None, :].astype(dtype)


def combine_biases(*biases) -> Optional[jax.Array]:
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out
