#!/usr/bin/env python
"""Compile + correctness smoke of the flash attention kernels on the REAL
TPU (Mosaic), bf16 and int8-cache paths — run this before long benches so
a kernel lowering problem surfaces in seconds, not mid-probe.

Usage: python scripts/flash_smoke.py [S] [KH] [G] [HD]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmrs_tpu.kernels.flash_attention import (flash_decode_batched,
                                                  flash_decode_stacked)
    from lmrs_tpu.models.transformer import quantize_kv_rows
    from lmrs_tpu.ops.attention import attention

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    KH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    HD = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    L, H = 2, KH * G
    print(f"device={jax.devices()[0]} S={S} KH={KH} G={G} HD={HD}",
          flush=True)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, H, HD), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((L, S, KH, HD), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((L, S, KH, HD), dtype=np.float32))
    kb = k.reshape(L, S, KH * HD).astype(jnp.bfloat16)
    vb = v.reshape(L, S, KH * HD).astype(jnp.bfloat16)
    pos = S - 8
    scale = 1.0 / np.sqrt(HD)

    ref = attention(q, kb[1].reshape(S, KH, HD), vb[1].reshape(S, KH, HD),
                    jnp.int32(pos), scale=scale, precision="fast")

    for label, kw in [
        ("bf16", {}),
        ("bf16+window", dict(window=4096, softcap=50.0)),
    ]:
        t0 = time.time()
        out = jax.jit(lambda q, kb, vb: flash_decode_stacked(
            q, kb, vb, jnp.int32(1), jnp.int32(pos), n_kv=KH, attn_len=S,
            scale=scale, **kw))(q, kb, vb)
        out.block_until_ready()
        t1 = time.time()
        if "window" not in kw:
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"stacked {label}: compile+run {t1 - t0:.1f}s "
                  f"max|err|={err:.4f}", flush=True)
            assert err < 3e-2, err
        else:
            print(f"stacked {label}: compile+run {t1 - t0:.1f}s "
                  f"finite={bool(jnp.isfinite(out).all())}", flush=True)

    # int8 cache path (scale planes are sequence-last: (L, KH, S))
    kq, ks = jax.vmap(quantize_kv_rows)(k)
    vq, vs = jax.vmap(quantize_kv_rows)(v)
    ks, vs = ks.transpose(0, 2, 1), vs.transpose(0, 2, 1)
    t0 = time.time()
    out = jax.jit(lambda q, kq, vq, ks, vs: flash_decode_stacked(
        q, kq, vq, jnp.int32(1), jnp.int32(pos), n_kv=KH, attn_len=S,
        scale=scale, k_scale=ks, v_scale=vs))(q, kq, vq, ks, vs)
    out.block_until_ready()
    t1 = time.time()
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"stacked int8: compile+run {t1 - t0:.1f}s max|err|={err:.4f}",
          flush=True)
    assert err < 6e-2, err

    # int4 (nibble-packed) cache path — needs hd % 256 == 0
    if HD % 256 == 0:
        from lmrs_tpu.models.transformer import quantize_kv_rows_q4

        kq4, ks4 = jax.vmap(quantize_kv_rows_q4)(k)
        vq4, vs4 = jax.vmap(quantize_kv_rows_q4)(v)
        ks4, vs4 = ks4.transpose(0, 2, 1), vs4.transpose(0, 2, 1)
        t0 = time.time()
        out = jax.jit(lambda q, kq, vq, ks, vs: flash_decode_stacked(
            q, kq, vq, jnp.int32(1), jnp.int32(pos), n_kv=KH, attn_len=S,
            scale=scale, k_scale=ks, v_scale=vs, packed4=True))(
                q, kq4, vq4, ks4, vs4)
        out.block_until_ready()
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"stacked int4: compile+run {time.time() - t0:.1f}s "
              f"max|err|={err:.4f}", flush=True)
        assert err < 0.2, err  # int4 is coarse; catches layout bugs only

    # batched variants (scheduler path)
    B = 4
    qB = jnp.asarray(rng.standard_normal((B, H, HD), dtype=np.float32))
    kB = jnp.broadcast_to(kb, (B,) + kb.shape)
    vB = jnp.broadcast_to(vb, (B,) + vb.shape)
    posB = jnp.asarray([17, S // 2, S - 9, 1000], jnp.int32)
    t0 = time.time()
    outB = jax.jit(lambda q, k, v: flash_decode_batched(
        q, k, v, jnp.int32(1), posB, n_kv=KH, attn_len=S,
        scale=scale))(qB, kB, vB)
    outB.block_until_ready()
    print(f"batched bf16: compile+run {time.time() - t0:.1f}s "
          f"finite={bool(jnp.isfinite(outB).all())}", flush=True)

    kqB = jnp.broadcast_to(kq, (B,) + kq.shape)
    vqB = jnp.broadcast_to(vq, (B,) + vq.shape)
    ksB = jnp.broadcast_to(ks, (B,) + ks.shape)
    vsB = jnp.broadcast_to(vs, (B,) + vs.shape)
    t0 = time.time()
    outB = jax.jit(lambda q, k, v, ks, vs: flash_decode_batched(
        q, k, v, jnp.int32(1), posB, n_kv=KH, attn_len=S,
        scale=scale, k_scale=ks, v_scale=vs))(qB, kqB, vqB, ksB, vsB)
    outB.block_until_ready()
    print(f"batched int8: compile+run {time.time() - t0:.1f}s "
          f"finite={bool(jnp.isfinite(outB).all())}", flush=True)

    # paged variant: page-table-driven BlockSpec index map (the scalar-
    # prefetch translation is the one NEW Mosaic surface vs batched)
    from lmrs_tpu.kernels.flash_attention import flash_decode_paged

    psz = 512
    maxp = S // psz
    # identity-ish scattered layout: slot b's virtual block j -> pool page
    perm = rng.permutation(np.arange(1, 1 + B * maxp))
    tableB = np.zeros((B, maxp), np.int32)
    kp = np.zeros((L, 1 + B * maxp, psz, KH * HD), np.float32)
    vp = np.zeros_like(kp)
    kb_np, vb_np = np.asarray(kb, np.float32), np.asarray(vb, np.float32)
    idx = 0
    for b in range(B):
        for j in range(maxp):
            pg = int(perm[idx]); idx += 1
            tableB[b, j] = pg
            kp[:, pg] = kb_np[:, j * psz:(j + 1) * psz]
            vp[:, pg] = vb_np[:, j * psz:(j + 1) * psz]
    kp = jnp.asarray(kp, jnp.bfloat16)
    vp = jnp.asarray(vp, jnp.bfloat16)
    refB = jax.jit(lambda q, k, v: flash_decode_batched(
        q, k, v, jnp.int32(1), posB, n_kv=KH, attn_len=S,
        scale=scale))(qB, kB, vB)
    t0 = time.time()
    outP = jax.jit(lambda q, k, v, t: flash_decode_paged(
        q, k, v, t, jnp.int32(1), posB, n_kv=KH,
        scale=scale))(qB, kp, vp, jnp.asarray(tableB))
    outP.block_until_ready()
    errP = float(jnp.max(jnp.abs(outP - refB)))
    print(f"paged bf16: compile+run {time.time() - t0:.1f}s "
          f"max|err vs batched|={errP:.4f}", flush=True)
    assert errP < 3e-2, errP
    print("flash smoke OK", flush=True)


if __name__ == "__main__":
    main()
