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
                  *, scale, block_k, kv_len):
    """One (batch, head, q-block) program: online softmax over kv blocks.

    q_ref: [block_q, d]; k_ref/v_ref: [Skv_pad, d]; bias_ref: [block_q,
    Skv_pad] or None; o_ref: [block_q, d]; m_out_ref/l_out_ref:
    [block_q] row max / normalizer for the backward pass (None on
    inference-only calls). Saved SEPARATELY, not as lse = m + log(l):
    at the framework's -0.7*f32max mask constant, |m| for a fully
    masked row is ~2.4e38 where one ulp is ~2e31 — the +log(l) term
    would be absorbed and the backward's probabilities would come out
    unnormalized.
    """
    q = q_ref[...].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kv_blocks = kv_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        kv_start = i * block_k
        kb = k_ref[pl.ds(kv_start, block_k), :].astype(jnp.float32)
        vb = v_ref[pl.ds(kv_start, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        if bias_ref is not None:
            s = s + bias_ref[:, pl.ds(kv_start, block_k)].astype(jnp.float32)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc0, m0, l0))

    if m_out_ref is not None:
        # l == 0 (true -inf masking everywhere in a row): park m at 0 /
        # l at 1 so the backward's exp(s - m)/l is exactly 0 (s = -inf)
        m_out_ref[...] = jnp.where(l == 0.0, 0.0, m)[:, 0]
        l_out_ref[...] = jnp.where(l == 0.0, 1.0, l)[:, 0]

    # rows that are fully masked (all -inf) produce l == 0; emit zeros
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _pad_inputs(q, k, v, bias, block_q, block_k):
    """Shared fwd/bwd padding: head_dim -> 128 lanes, seq lens -> block
    multiples, bias broadcast to concrete [B, Hb, Sq_pad, Skv_pad] with
    padded kv columns hard-masked. Returns the padded operands plus the
    geometry tuple."""
    b, h, sq, d = q.shape
    skv = k.shape[2]

    # Mosaic tiling: the lane (last) dim must be 128-aligned. BERT-family
    # head_dim is 64; zero-pad to 128 (zero q/k columns contribute nothing
    # to scores, zero v columns are sliced off the output).
    d_pad = _round_up(d, 128)
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
        # broadcast to concrete [B, Hb, Sq_pad, Skv_pad] (Hb in {1, h})
        hb = bias.shape[1]
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32), (b, hb, bias.shape[2], skv_pad)
        )
        if bias.shape[2] == 1:
            bias = jnp.broadcast_to(bias, (b, hb, sq_pad, skv_pad))
        elif bias.shape[2] != sq_pad:
            bias = jnp.pad(
                bias, ((0, 0), (0, 0), (0, sq_pad - bias.shape[2]), (0, 0))
            )
    geom = (b, h, sq, skv, d, d_pad, sq_pad, skv_pad, block_q, block_k)
    return q, k, v, bias, geom


def _flash_forward(q, k, v, bias, scale, block_q, block_k, interpret,
                   with_lse=False):
    q, k, v, bias, geom = _pad_inputs(q, k, v, bias, block_q, block_k)
    b, h, sq, skv, d, d_pad, sq_pad, skv_pad, block_q, block_k = geom

    grid = (b, h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, kv_len=skv_pad
    )

    q_spec = pl.BlockSpec((1, 1, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0))
    k_spec = pl.BlockSpec((1, 1, skv_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0))
    in_specs = [q_spec, k_spec, k_spec]
    args = [q, k, v]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0))
    ]
    out_shapes = [jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype)]
    if with_lse:
        row_spec = pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, hi, qi))
        row_shape = jax.ShapeDtypeStruct((b, h, sq_pad), jnp.float32)
        out_specs += [row_spec, row_spec]
        out_shapes += [row_shape, row_shape]

    def _row_refs(refs):
        if with_lse:
            return refs[1].at[0, 0], refs[2].at[0, 0]
        return None, None

    if bias is not None:
        hb = bias.shape[1]
        if hb == 1:
            b_spec = pl.BlockSpec(
                (1, 1, block_q, skv_pad), lambda bi, hi, qi: (bi, 0, qi, 0)
            )
        else:
            b_spec = pl.BlockSpec(
                (1, 1, block_q, skv_pad), lambda bi, hi, qi: (bi, hi, qi, 0)
            )
        in_specs.append(b_spec)
        args.append(bias)
        wrapped = lambda qr, kr, vr, br, *out_refs: kernel(
            qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], br.at[0, 0],
            out_refs[0].at[0, 0], *_row_refs(out_refs),
        )
    else:
        wrapped = lambda qr, kr, vr, *out_refs: kernel(
            qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], None,
            out_refs[0].at[0, 0], *_row_refs(out_refs),
        )

    outs = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shapes if with_lse else out_shapes[0],
        interpret=interpret,
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
                         l_ref, delta_ref, dq_ref, *, scale, block_k,
                         kv_len):
    """One (batch, head, q-block) program: dq = scale * sum_k ds @ K.

    q/do/dq: [block_q, d]; k/v: [Skv_pad, d]; bias: [block_q, Skv_pad];
    m/l/delta: [block_q]. p = exp(s - m) / l; ds = p * (dO V^T - delta).
    """
    q = q_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    m = m_ref[...][:, None]  # [bq, 1]
    linv = 1.0 / l_ref[...][:, None]
    delta = delta_ref[...][:, None]
    block_q, d = q.shape
    num_kv_blocks = kv_len // block_k

    def body(i, dq):
        kv_start = i * block_k
        kb = k_ref[pl.ds(kv_start, block_k), :].astype(jnp.float32)
        vb = v_ref[pl.ds(kv_start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * scale, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias_ref is not None:
            s = s + bias_ref[:, pl.ds(kv_start, block_k)].astype(jnp.float32)
        p = jnp.exp(s - m) * linv
        dp = jax.lax.dot_general(
            do, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(
        0, num_kv_blocks, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, m_ref,
                          l_ref, delta_ref, dk_ref, dv_ref, *, scale,
                          block_q, q_len):
    """One (batch, head, kv-block) program:
    dv = sum_q P^T dO;  dk = scale * sum_q ds^T Q.

    k/v/dk/dv: [block_k, d]; q/do: [Sq_pad, d]; bias: [Sq_pad, block_k];
    m/l/delta: [Sq_pad].
    """
    kb = k_ref[...].astype(jnp.float32)
    vb = v_ref[...].astype(jnp.float32)
    block_k, d = kb.shape
    num_q_blocks = q_len // block_q

    def body(i, carry):
        dk, dv = carry
        q_start = i * block_q
        qb = q_ref[pl.ds(q_start, block_q), :].astype(jnp.float32)
        dob = do_ref[pl.ds(q_start, block_q), :].astype(jnp.float32)
        m = m_ref[pl.ds(q_start, block_q)][:, None]
        linv = 1.0 / l_ref[pl.ds(q_start, block_q)][:, None]
        delta = delta_ref[pl.ds(q_start, block_q)][:, None]
        s = jax.lax.dot_general(
            qb * scale, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        if bias_ref is not None:
            s = s + bias_ref[pl.ds(q_start, block_q), :].astype(jnp.float32)
        p = jnp.exp(s - m) * linv
        dv = dv + jax.lax.dot_general(
            p, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_k, d]
        dp = jax.lax.dot_general(
            dob, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_k, d]
        return dk, dv

    zero = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q_blocks, body, (zero, zero))
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


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
    # m and l come back from the forward already at sq_pad length; pad
    # rows carry l from the kernel (>= 1 wherever bias kept any column,
    # 1 via the masked-row sentinel otherwise) so 1/l is always finite

    d_spec = pl.BlockSpec((1, 1, block_q, d_pad),
                          lambda bi, hi, qi: (bi, hi, qi, 0))
    full_q_spec = pl.BlockSpec((1, 1, sq_pad, d_pad),
                               lambda bi, hi, ki: (bi, hi, 0, 0))
    kv_spec = pl.BlockSpec((1, 1, skv_pad, d_pad),
                           lambda bi, hi, qi: (bi, hi, 0, 0))
    kv_blk_spec = pl.BlockSpec((1, 1, block_k, d_pad),
                               lambda bi, hi, ki: (bi, hi, ki, 0))
    lse_q_spec = pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, hi, qi))
    lse_full_spec = pl.BlockSpec((1, 1, sq_pad), lambda bi, hi, ki: (bi, hi, 0))

    hb = bias.shape[1] if bias is not None else 1

    # ---- dq: grid over q blocks -------------------------------------
    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, block_k=block_k, kv_len=skv_pad
    )
    in_specs = [d_spec, kv_spec, kv_spec]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q, skv_pad),
            (lambda bi, hi, qi: (bi, hi, qi, 0)) if hb > 1
            else (lambda bi, hi, qi: (bi, 0, qi, 0)),
        ))
        args.append(bias)
    in_specs += [d_spec, lse_q_spec, lse_q_spec, lse_q_spec]
    args += [g, m, l, delta]

    def dq_wrapped(qr, kr, vr, *rest):
        if bias is not None:
            br, dor, mr, lr, deltar, dqr = rest
            br = br.at[0, 0]
        else:
            dor, mr, lr, deltar, dqr = rest
            br = None
        dq_kernel(qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], br,
                  dor.at[0, 0], mr.at[0, 0], lr.at[0, 0],
                  deltar.at[0, 0], dqr.at[0, 0])

    dq = pl.pallas_call(
        dq_wrapped,
        grid=(b, h, sq_pad // block_q),
        in_specs=in_specs,
        out_specs=d_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(*args)

    # ---- dk, dv: grid over kv blocks --------------------------------
    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, block_q=block_q, q_len=sq_pad
    )
    in_specs = [full_q_spec, kv_blk_spec, kv_blk_spec]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, sq_pad, block_k),
            (lambda bi, hi, ki: (bi, hi, 0, ki)) if hb > 1
            else (lambda bi, hi, ki: (bi, 0, 0, ki)),
        ))
        args.append(bias)
    in_specs += [full_q_spec, lse_full_spec, lse_full_spec, lse_full_spec]
    args += [g, m, l, delta]

    def dkv_wrapped(qr, kr, vr, *rest):
        if bias is not None:
            br, dor, mr, lr, deltar, dkr, dvr = rest
            br = br.at[0, 0]
        else:
            dor, mr, lr, deltar, dkr, dvr = rest
            br = None
        dkv_kernel(qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], br,
                   dor.at[0, 0], mr.at[0, 0], lr.at[0, 0],
                   deltar.at[0, 0], dkr.at[0, 0], dvr.at[0, 0])

    dk, dv = pl.pallas_call(
        dkv_wrapped,
        grid=(b, h, skv_pad // block_k),
        in_specs=in_specs,
        out_specs=[kv_blk_spec, kv_blk_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h, skv_pad, d_pad), jnp.float32),
        ],
        interpret=interpret,
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
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with [B,H,S,D] layout and optional additive bias."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def default_impl() -> str:
    """Measured on v5e (B=32,H=12,S=228,D=64, bf16): XLA fused attention
    ~580us/call vs this flash kernel ~1.7ms — at BERT-scale seq lens the
    score matrix is tiny and XLA's fusion is already near-roofline, while
    the pallas grid overhead dominates. Default to XLA; flash is the right
    tool once seq lens grow (long-context stretch goal, SURVEY.md §5) or
    via MMF_TPU_ATTENTION=pallas."""
    import os

    env = os.environ.get("MMF_TPU_ATTENTION", "")
    if env in ("pallas", "xla", "pallas_interpret"):
        return env
    return "xla"


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Framework-wide attention entry point. [B,H,S,D] layout.

    impl: None (auto), "pallas", "pallas_interpret" (tests), or "xla".
    dropout_rate/dropout_rng: attention-probs dropout (train only); the
    flash kernel has no probs to drop, so active dropout always routes
    through the XLA path.
    """
    if impl is None:
        impl = default_impl()
    if dropout_rate > 0.0 and dropout_rng is not None:
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
