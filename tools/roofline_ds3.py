"""Shape-stage block-residue roofline decomposition (VERDICT r1 weak #2 for
ds3; ``--ds2`` reuses it for the ds2 headroom question, VERDICT r2 next #5).

Times, as separate jitted programs on the attached device (each looping
``INNER`` times inside one jit so dispatch overhead is amortized):
  - the full composed DiTBlock stack (attn_impl xla),
  - the same block through the shipped DiT megakernel (fused_block: true),
  - attention only (qkv -> scores -> softmax -> PV -> proj),
  - the adaLN-MLP half only,
and prints per-block-eval times next to the analytic MXU / VPU / HBM floors
(BASELINE.md "Roofline" section). The fused row's MFU against the MXU floor
IS the remaining headroom number: at 100% the metric is closed.

Run: python tools/roofline_ds3.py [--ds2]  (axon TPU; CPU works but floors
are v5e-specific).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

if __import__("os").environ.get("JAX_PLATFORMS"):
    # axon plugin overrides JAX_PLATFORMS from the env; re-assert it
    import jax

    jax.config.update("jax_platforms",
                      __import__("os").environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

B, N, H, HEADS, MLP = 256, 450, 480, 6, 4
if "--ds2" in sys.argv:
    N = 135  # cfm_ds2_electrons.yaml token count; B/H/heads are shared
D = H // HEADS
INNER = 40  # large enough that the ~28 ms/dispatch tunnel floor is < 2%
if "--smoke" in sys.argv:  # CPU plumbing check (interpret-mode kernels)
    B, INNER = 4, 2

V5E_MXU_TFLOPS = 197e12
V5E_VPU_OPS = 6.16e12  # 8x128 lanes x 4 ALUs x 1.50 GHz
V5E_HBM_BPS = 819e9


_DISPATCH_FLOOR = [0.0]


def timed(fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # exact sync via scalar fetch (tunnel-safe)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    return max(0.0, time.perf_counter() - t0 - _DISPATCH_FLOOR[0]) / INNER


def measure_dispatch_floor():
    """Wall time of one near-empty jitted program + scalar fetch — the
    per-dispatch tunnel overhead to subtract from every measurement."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    _DISPATCH_FLOOR[0] = min(ts)
    return _DISPATCH_FLOOR[0]


def main():
    from vit4hep_tpu.models.vit import DiTBlock

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, H), jnp.float32)
    c = jax.random.normal(jax.random.fold_in(key, 1), (B, H), jnp.float32)
    block = DiTBlock(hidden=H, num_heads=HEADS, mlp_ratio=float(MLP), attn_impl="xla")
    params = block.init(key, x, c)["params"]
    # the shipped sampling-path kernel tier (identical param tree)
    block_f = DiTBlock(hidden=H, num_heads=HEADS, mlp_ratio=float(MLP),
                       attn_impl="auto", fused_block=True)

    def full_stack(x, c):
        def body(h, _):
            return block.apply({"params": params}, h, c), None
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    def fused_stack(x, c):
        def body(h, _):
            return block_f.apply({"params": params}, h, c), None
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    # attention sub-program: qkv -> heads -> softmax -> PV -> out-proj
    kq = jax.random.fold_in(key, 2)
    wqkv = jax.random.normal(kq, (H, 3 * H), jnp.float32) * 0.02
    wo = jax.random.normal(jax.random.fold_in(key, 3), (H, H), jnp.float32) * 0.02

    def attn_only(x):
        def body(h, _):
            qkv = h @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, HEADS, D).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, HEADS, D).transpose(0, 2, 1, 3)
            v = v.reshape(B, N, HEADS, D).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, N, H)
            return o @ wo, None
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    w1 = jax.random.normal(jax.random.fold_in(key, 4), (H, MLP * H), jnp.float32) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(key, 5), (MLP * H, H), jnp.float32) * 0.02

    def mlp_only(x):
        def body(h, _):
            u = jax.nn.gelu(h @ w1, approximate=True)
            return u @ w2, None
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    # ---- micro components: attribute the block time empirically ----
    kv = jax.random.fold_in(key, 6)
    s0 = jax.random.normal(kv, (B, HEADS, N, N), jnp.float32)
    u0 = jax.random.normal(jax.random.fold_in(key, 7), (B, N, MLP * H), jnp.float32)
    q0 = jax.random.normal(jax.random.fold_in(key, 8), (B, HEADS, N, D), jnp.float32)
    k0 = jax.random.normal(jax.random.fold_in(key, 9), (B, HEADS, N, D), jnp.float32)
    v0 = jax.random.normal(jax.random.fold_in(key, 10), (B, HEADS, N, D), jnp.float32)

    def scan_of(body):
        def prog(cin):
            out, _ = jax.lax.scan(lambda h, _: (body(h), None), cin, None,
                                  length=INNER)
            return out
        return prog

    softmax_only = scan_of(lambda s: jax.nn.softmax(s, axis=-1))
    exp_only = scan_of(lambda s: jnp.exp(-jnp.abs(s)))
    gelu_only = scan_of(lambda u: jax.nn.gelu(u, approximate=True))

    # k/v must be jit ARGUMENTS, not closure captures — captured device
    # arrays are embedded as constants in the serialized module and a
    # 220 MB constant blows the tunnel's remote-compile request limit
    def attn_matmuls(q, k, v):
        def body(qc, _):
            s = jnp.einsum("bhqd,bhkd->bhqk", qc, k)
            return jnp.einsum("bhqk,bhkd->bhqd", s, v), None
        out, _ = jax.lax.scan(body, q, None, length=INNER)
        return out

    def mlp_nogelu(h):
        def body(hc, _):
            return (hc @ w1) @ w2, None
        out, _ = jax.lax.scan(body, h, None, length=INNER)
        return out

    # warm-up fetch for tunnel backlog
    float(jnp.zeros(()))
    floor = measure_dispatch_floor()
    print(f"dispatch floor: {floor * 1e3:.1f} ms (subtracted)")

    t_full = timed(full_stack, x, c)
    t_fused = timed(fused_stack, x, c)
    t_attn = timed(attn_only, x)
    t_mlp = timed(mlp_only, x)

    flop_block = 2 * (12 * H * H * N + 2 * N * N * H) * B
    flop_attn = 2 * (4 * H * H * N + 2 * N * N * H) * B
    flop_mlp = 2 * (8 * H * H * N) * B
    f32 = 4
    bytes_attn = (3 * B * N * H * 2 + 2 * B * HEADS * N * N + B * N * H * 2) * f32
    bytes_mlp = (B * N * MLP * H * 2 + B * N * H * 2) * f32
    vpu_attn = B * HEADS * N * N * 6  # softmax ~6 ops/elem
    vpu_mlp = B * N * MLP * H * 10    # tanh-gelu ~10 ops/elem

    def report(name, t, flop, byts, vops):
        print(f"{name:10s} {t * 1e3:8.2f} ms/eval | floors: "
              f"MXU {flop / V5E_MXU_TFLOPS * 1e3:6.2f}  "
              f"HBM {byts / V5E_HBM_BPS * 1e3:6.2f}  "
              f"VPU {vops / V5E_VPU_OPS * 1e3:6.2f} ms | "
              f"MFU {flop / t / V5E_MXU_TFLOPS * 100:5.1f}%")

    print(f"device: {jax.devices()[0].platform}, shapes B={B} N={N} H={H} "
          f"heads={HEADS} (INNER={INNER})")
    report("block", t_full, flop_block, bytes_attn + bytes_mlp, vpu_attn + vpu_mlp)
    # fused row: one HBM round trip of x per block — its HBM floor is just
    # 2*B*N*H*f32; the MFU column is the remaining-headroom number
    report("fused_blk", t_fused, flop_block, 2 * B * N * H * f32,
           vpu_attn + vpu_mlp)
    report("attn", t_attn, flop_attn, bytes_attn, vpu_attn)
    report("mlp", t_mlp, flop_mlp, bytes_mlp, vpu_mlp)

    n_score = B * HEADS * N * N       # 311M at ds3
    n_mlpact = B * N * MLP * H        # 221M at ds3
    flop_am = 2 * (2 * N * N * H) * B
    micro = [
        ("attn_mm", attn_matmuls, (q0, k0, v0), flop_am,
         (2 * B * HEADS * N * N + 3 * B * N * H) * f32, 0),
        ("softmax", softmax_only, s0, 0, 2 * n_score * f32, n_score * 6),
        ("exp", exp_only, s0, 0, 2 * n_score * f32, n_score * 2),
        ("gelu", gelu_only, u0, 0, 2 * n_mlpact * f32, n_mlpact * 10),
        ("mlp_mm", mlp_nogelu, x, flop_mlp, bytes_mlp, 0),
    ]
    print("-- micro components (each its own fused program) --")
    for name, fn, arg, flop, byts, vops in micro:
        args = arg if isinstance(arg, tuple) else (arg,)
        report(name, timed(fn, *args), flop, byts, vops)


if __name__ == "__main__":
    main()
