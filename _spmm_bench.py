import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    N, E, D = 100_000, 2_000_000, 128
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src_s, dst_s = src[order], dst[order]
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    def timeit(f, iters=20):
        o = f(); _ = float(np.asarray(o))
        # scan-free: loop dispatch, fetch once
        t0 = time.perf_counter()
        for _ in range(iters): o = f()
        _ = float(np.asarray(o))
        return (time.perf_counter()-t0)/iters

    s1 = jax.jit(lambda s_, d_: jax.ops.segment_sum(x[s_], d_, num_segments=N).sum())
    t = timeit(lambda: s1(jnp.asarray(src), jnp.asarray(dst)))
    print(f"segment_sum unsorted: {t*1e3:.2f} ms  {E/t/1e6:.0f} M edges/s")
    s2 = jax.jit(lambda s_, d_: jax.ops.segment_sum(x[s_], d_, num_segments=N, indices_are_sorted=True).sum())
    t = timeit(lambda: s2(jnp.asarray(src_s), jnp.asarray(dst_s)))
    print(f"segment_sum sorted:   {t*1e3:.2f} ms  {E/t/1e6:.0f} M edges/s")

    # CSR fixed-width window mean (dense blocks): pad rows to W
    W = 32
    from gigl_tpu.graph.csr import build_csr
    csr = build_csr(src, dst, num_anchor_nodes=N, anchor="dst")
    indptr, indices = csr.indptr, csr.indices
    deg = np.diff(indptr)
    print("deg: mean", deg.mean(), "p99", np.percentile(deg, 99), "max", deg.max())
    # dense neighbor matrix N x W (truncating rows beyond W)
    padded = np.zeros((N, W), np.int32)
    valid = np.zeros((N, W), bool)
    for wstart in [0]:
        take = np.minimum(deg, W)
    rows = np.repeat(np.arange(N), take)
    cols = np.concatenate([np.arange(t_) for t_ in take]) if N else None
    flat_idx = np.concatenate([indices[indptr[i]:indptr[i]+take[i]] for i in range(N)])
    padded[rows, cols] = flat_idx
    valid[rows, cols] = True
    padded_j = jnp.asarray(padded); valid_j = jnp.asarray(valid)
    def dense_agg(p_, v_):
        f = x[p_]                     # [N, W, D]
        return (f * v_[..., None]).sum(1).sum()
    d1 = jax.jit(dense_agg)
    t = timeit(lambda: d1(padded_j, valid_j))
    cov = valid.sum() / E
    print(f"dense W={W} window:   {t*1e3:.2f} ms  {valid.sum()/t/1e6:.0f} M edges/s (covers {cov*100:.0f}% edges)")
if __name__ == "__main__":
    main()
