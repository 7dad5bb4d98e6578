"""Flash (blockwise) decode attention vs the XLA reference formulation.

The kernel must match ops.attention.attention(precision="fast") — same bf16
dot operands, f32 accumulation — to bf16 tolerance, across every masking
mode the three model families use (none / softcap / sliding window), with
positions that cross block boundaries and exercise the window block-skip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmrs_tpu.kernels.flash_attention import (flash_decode_batched,
                                              flash_decode_stacked)
from lmrs_tpu.ops.attention import attention

# heavyweight interpret-mode / mesh parity matrix: excluded from the
# default fast run (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow



def _mk(rng, L, S, KH, H, HD, T):
    """k/v returned BOTH ways: 4D for the XLA reference, 3D (merged
    (KH, hd) lanes — the engine's storage layout) for the kernel."""
    q = rng.standard_normal((T, H, HD), dtype=np.float32)
    k = rng.standard_normal((L, S, KH, HD), dtype=np.float32)
    v = rng.standard_normal((L, S, KH, HD), dtype=np.float32)
    k4 = jnp.asarray(k).astype(jnp.bfloat16)
    v4 = jnp.asarray(v).astype(jnp.bfloat16)
    return jnp.asarray(q), k4, v4


@pytest.mark.parametrize("t_q", [1, 4])
@pytest.mark.parametrize("softcap,window", [
    (None, None),          # llama/phi
    (50.0, 4096),          # gemma (window larger than context: no skip)
    (50.0, 256),           # gemma long-context: window block-skip engaged
])
def test_flash_matches_xla(t_q, softcap, window):
    L, S, KH, G, HD = 3, 1024, 4, 2, 128
    H = KH * G
    attn_len = 1024
    rng = np.random.default_rng(0)
    q, k, v = _mk(rng, L, S, KH, H, HD, t_q)
    scale = 1.0 / np.sqrt(HD)

    for layer in [0, 2]:
        for pos in [0, 3, 511, 900, 1024 - t_q]:
            ref = attention(q, k[layer, :attn_len], v[layer, :attn_len],
                            jnp.int32(pos), scale=scale, softcap=softcap,
                            window=window, precision="fast")
            out = flash_decode_stacked(
                q, k.reshape(L, S, KH * HD), v.reshape(L, S, KH * HD),
                jnp.int32(layer), jnp.int32(pos), n_kv=KH,
                attn_len=attn_len, scale=scale, softcap=softcap,
                window=window, s_blk=256, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=0, atol=2e-2)


def test_flash_window_skip_reads_correct_blocks():
    """With a small window at a large pos the kernel only visits
    ~window/s_blk blocks; corrupting the skipped region must not change the
    output (proves those rows are never read)."""
    L, S, KH, G, HD = 2, 2048, 2, 2, 128
    H = KH * G
    rng = np.random.default_rng(1)
    q, k, v = _mk(rng, L, S, KH, H, HD, 1)
    pos = 2000
    window = 256
    out1 = flash_decode_stacked(q, k.reshape(L, S, KH * HD),
                                v.reshape(L, S, KH * HD),
                                jnp.int32(1), jnp.int32(pos), n_kv=KH,
                                attn_len=2048, scale=0.1, window=window,
                                s_blk=256, interpret=True)
    # poison rows far before the window (blocks the plan skips entirely)
    k_bad = k.at[:, :1024].set(jnp.nan)
    v_bad = v.at[:, :1024].set(jnp.nan)
    out2 = flash_decode_stacked(q, k_bad.reshape(L, S, KH * HD),
                                v_bad.reshape(L, S, KH * HD), jnp.int32(1),
                                jnp.int32(pos), n_kv=KH,
                                attn_len=2048, scale=0.1,
                                window=window, s_blk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out2)).all()


@pytest.mark.parametrize("t_q", [64, 256])
@pytest.mark.parametrize("softcap,window", [
    (None, None),
    (50.0, 256),
])
def test_flash_prefill_chunk_matches_xla(t_q, softcap, window):
    """The same kernel serves PREFILL chunks (t_q up to 256): causal
    masking inside the chunk, chunk start off a block boundary, window
    skip relative to the chunk head."""
    L, S, KH, G, HD = 2, 2048, 2, 2, 128
    H = KH * G
    attn_len = 2048
    rng = np.random.default_rng(3)
    q, k, v = _mk(rng, L, S, KH, H, HD, t_q)
    scale = 1.0 / np.sqrt(HD)

    for pos in [0, 300, 2048 - t_q]:
        ref = attention(q, k[1, :attn_len], v[1, :attn_len],
                        jnp.int32(pos), scale=scale, softcap=softcap,
                        window=window, precision="fast")
        out = flash_decode_stacked(
            q, k.reshape(L, S, KH * HD), v.reshape(L, S, KH * HD),
            jnp.int32(1), jnp.int32(pos), n_kv=KH,
            attn_len=attn_len, scale=scale, softcap=softcap,
            window=window, s_blk=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=2e-2)


@pytest.mark.parametrize("t_q", [1, 64])
def test_flash_live_clamp_skips_dead_bucket_tail(t_q):
    """attn_len is a pow-2 bucket up to 2x the true context: blocks past
    the last row any query attends to must never be READ (clamped index +
    compute skip) — poisoning them with NaN cannot change the output."""
    L, S, KH, G, HD = 2, 2048, 2, 2, 128
    H = KH * G
    rng = np.random.default_rng(4)
    q, k, v = _mk(rng, L, S, KH, H, HD, t_q)
    pos = 700   # last live row 700 + t_q - 1 < 1024; blocks 4.. are dead
    out1 = flash_decode_stacked(q, k.reshape(L, S, KH * HD),
                                v.reshape(L, S, KH * HD),
                                jnp.int32(0), jnp.int32(pos), n_kv=KH,
                                attn_len=2048, scale=0.1,
                                s_blk=256, interpret=True)
    dead0 = ((pos + t_q - 1) // 256 + 1) * 256
    k_bad = k.at[:, dead0:].set(jnp.nan)
    v_bad = v.at[:, dead0:].set(jnp.nan)
    out2 = flash_decode_stacked(q, k_bad.reshape(L, S, KH * HD),
                                v_bad.reshape(L, S, KH * HD),
                                jnp.int32(0), jnp.int32(pos), n_kv=KH,
                                attn_len=2048, scale=0.1,
                                s_blk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out2)).all()


def test_flash_batched_live_clamp():
    """Per-slot live clamp: a short conversation sharing a batch with a
    deep one must not read past its own position's block."""
    B, L, S, KH, G, HD = 2, 2, 2048, 2, 2, 128
    H = KH * G
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, H, HD), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    pos = jnp.asarray([100, 2000], jnp.int32)
    out1 = flash_decode_batched(q, k.reshape(B, L, S, KH * HD),
                                v.reshape(B, L, S, KH * HD),
                                jnp.int32(0), pos, n_kv=KH,
                                attn_len=2048, scale=0.1,
                                s_blk=256, interpret=True)
    # poison slot 0 beyond its live block (rows 256..); slot 1 stays clean
    k_bad = k.at[0, :, 256:].set(jnp.nan)
    v_bad = v.at[0, :, 256:].set(jnp.nan)
    out2 = flash_decode_batched(q, k_bad.reshape(B, L, S, KH * HD),
                                v_bad.reshape(B, L, S, KH * HD),
                                jnp.int32(0), pos, n_kv=KH,
                                attn_len=2048, scale=0.1,
                                s_blk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out2)).all()


@pytest.mark.parametrize("softcap,window", [(None, None), (50.0, 300)])
def test_flash_batched_matches_per_slot(softcap, window):
    B, L, S, KH, G, HD = 3, 2, 1024, 2, 2, 128
    H = KH * G
    attn_len = 1024
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, H, HD), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, S, KH, HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    pos = jnp.asarray([5, 700, 1023], jnp.int32)
    scale = 1.0 / np.sqrt(HD)
    layer = 1

    out = flash_decode_batched(q, k.reshape(B, L, S, KH * HD),
                               v.reshape(B, L, S, KH * HD),
                               jnp.int32(layer), pos, n_kv=KH,
                               attn_len=attn_len, scale=scale,
                               softcap=softcap, window=window,
                               s_blk=256, interpret=True)
    for b in range(B):
        ref = attention(q[b][None], k[b, layer, :attn_len],
                        v[b, layer, :attn_len], pos[b], scale=scale,
                        softcap=softcap, window=window, precision="fast")
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref[0]),
                                   rtol=0, atol=2e-2)


@pytest.mark.parametrize("t_q", [1, 4])
@pytest.mark.parametrize("softcap,window", [(None, None), (50.0, 96)])
def test_flash_batched_cp_merge_matches_unsharded(t_q, softcap, window):
    """seq_base + return_lse: the batched kernel run per sequence shard of
    a cp mesh, merged with the online-softmax cross-shard reduction
    (m_g=pmax(m); w=exp(m-m_g); psum(acc*w)/psum(l*w)), must match the
    SAME kernel run unsharded — including slots whose live rows sit
    entirely on one shard (the other shard's w underflows to exactly 0)
    and positions/verify-windows that straddle the shard boundary."""
    from jax.sharding import Mesh, PartitionSpec as P

    B, L, S, KH, G, HD = 3, 2, 256, 2, 2, 128
    H = KH * G
    rng = np.random.default_rng(9)
    qs = (B, H, HD) if t_q == 1 else (B, t_q, H, HD)
    q = jnp.asarray(rng.standard_normal(qs, dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, S, KH * HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, S, KH * HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    # slot 0: shard-0-only; slot 1: straddles row 128; slot 2: deep
    pos = jnp.asarray([5, 127, 250 - t_q], jnp.int32)
    scale = 1.0 / np.sqrt(HD)
    layer = jnp.int32(1)

    want = flash_decode_batched(q, k, v, layer, pos, n_kv=KH, attn_len=S,
                                scale=scale, softcap=softcap, window=window,
                                s_blk=64, interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("cp",))

    def body(q, k, v, pos):
        s_loc = k.shape[2]
        base = jax.lax.axis_index("cp") * s_loc
        acc, m, l = flash_decode_batched(
            q, k, v, layer, pos, n_kv=KH, attn_len=s_loc, scale=scale,
            softcap=softcap, window=window, s_blk=64, interpret=True,
            seq_base=base, return_lse=True)
        m_g = jax.lax.pmax(m, "cp")
        w = jnp.exp(m - m_g)
        num = jax.lax.psum(acc * w[..., None], "cp")
        den = jax.lax.psum(l * w, "cp")
        return num / den[..., None]

    seq_p = P(None, None, "cp", None)
    got = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), seq_p, seq_p, P()),
        out_specs=P(), check_vma=False))(q, k, v, pos)
    # 2e-3: f32 reduction-order noise only (blocks merged per shard, then
    # across shards, vs one sequential pass) — a masking bug would be O(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-3)


@pytest.mark.parametrize("t_q", [1, 4])
def test_flash_batched_cp_window_block_skip(t_q):
    """cp + sliding window where the start-block SKIP actually triggers
    (n_blk=3 < n_total=4 per shard): with s_loc=256, s_blk=64, window=96
    the kernel's `start = clip((first_row - base)//s_blk, 0, n_total-n_blk)`
    is nonzero on some shard for deep slots.  Slots cover: window entirely
    on shard 0 (slot 0), window straddling the shard boundary (slot 1 —
    shard 0 skips blocks yet keeps live rows, shard 1 starts at block 0),
    shard 0 fully behind the window (slot 2 — its contribution must
    underflow to exactly 0 in the merge), and a deep slot with a mid-shard
    window start on shard 1 (slot 3)."""
    from jax.sharding import Mesh, PartitionSpec as P

    B, L, S, KH, G, HD = 4, 2, 512, 2, 2, 128
    H = KH * G
    window = 96
    rng = np.random.default_rng(17)
    qs = (B, H, HD) if t_q == 1 else (B, t_q, H, HD)
    q = jnp.asarray(rng.standard_normal(qs, dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, S, KH * HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, S, KH * HD),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    pos = jnp.asarray([80, 280, 420, 508 - t_q], jnp.int32)
    scale = 1.0 / np.sqrt(HD)
    layer = jnp.int32(1)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("cp",))

    def body(q, k, v, pos):
        s_loc = k.shape[2]
        base = jax.lax.axis_index("cp") * s_loc
        acc, m, l = flash_decode_batched(
            q, k, v, layer, pos, n_kv=KH, attn_len=s_loc, scale=scale,
            softcap=50.0, window=window, s_blk=64, interpret=True,
            seq_base=base, return_lse=True)
        m_g = jax.lax.pmax(m, "cp")
        w = jnp.exp(m - m_g)
        num = jax.lax.psum(acc * w[..., None], "cp")
        den = jax.lax.psum(l * w, "cp")
        return num / den[..., None]

    seq_p = P(None, None, "cp", None)
    got = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), seq_p, seq_p, P()),
        out_specs=P(), check_vma=False))(q, k, v, pos)

    # independent reference: the XLA attention formulation per slot
    k4 = k.reshape(B, L, S, KH, HD)
    v4 = v.reshape(B, L, S, KH, HD)
    for b in range(B):
        qb = q[b][None] if t_q == 1 else q[b]
        ref = attention(qb, k4[b, 1], v4[b, 1], pos[b], scale=scale,
                        softcap=50.0, window=window, precision="fast")
        refb = ref[0] if t_q == 1 else ref
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(refb),
                                   rtol=0, atol=2e-2)
