"""Bisect the per-step large-N cost into components, on the real chip.

Cut-down scan programs (same shard_map/gspec as the trainer's step) at
N=100k and N=3M, int8-quantized, K=500:
  batch_only : positives draw + shared random negatives
  expand     : + frozen-table tree expansion for all 3 groups
  hydrate    : + fused-table union hydration gathers
  fwd        : + encode + loss (no grad, no optimizer)
  (full step : measured by largen_probe2 — 0.488 / 0.821 ms)
The first mode whose 100k->3M delta explodes is the cliff.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from largen_probe2 import build_trainer  # noqa: E402


def make_prog(tr, mode, K):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    axis = tr.axis
    n_tab = len(tr.pg.sample_tables or ())
    gspec = (P(axis), P(axis, None), P(axis, None),
             P(axis, None), P(axis, None),
             P(axis, None), P(axis, None),
             P(axis, None), P(axis, None), P(axis, None),
             tuple(P(axis) for _ in range(n_tab)))

    def local(g, params, anchors_kb, rngs):
        g = tr._unblock(g)

        def body(acc, xs):
            a, step, rng = xs
            batch, _ovf = tr._make_batch(g, a, step)
            s = acc + jnp.sum(batch.pos) + jnp.sum(batch.random_neg)
            if mode == "batch_only":
                return s, None
            groups = [(batch.anchors, 0), (batch.pos, 1),
                      (batch.random_neg, 2)]
            if mode in ("expand", "hydrate"):
                feat_deg_l = g[0]
                rows_max = feat_deg_l.shape[0] - 1
                for (r, off) in groups:
                    ids, masks, _o = tr._sample_tree(g, r, off)
                    for lvl in ids:
                        if mode == "expand":
                            s = s + jnp.sum(lvl)
                        else:
                            rows = feat_deg_l[
                                jnp.clip(lvl.reshape(-1), 0, rows_max)]
                            s = s + jnp.sum(
                                rows[:, 0].astype(jnp.int32))
                return s, None
            # fwd: encode + loss, no grad
            loss, _aux = tr._loss_local(g, params, None, a, step, rng)
            return s + loss.astype(jnp.int32), None

        steps = jnp.arange(K, dtype=jnp.int32)
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), (anchors_kb, steps, rngs))
        return acc

    return jax.jit(jax.shard_map(
        local, mesh=tr.mesh,
        in_specs=(gspec, P(), P(None, axis), P()),
        out_specs=P(), check_vma=False))


def run(tr, N, K=500):
    import jax

    B = 512
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
    params = state.params
    anchors = (np.arange(B * K).reshape(K, B) * 2654435761 % N).astype(
        np.int32)
    rngs = np.asarray(jax.random.split(jax.random.PRNGKey(1), K))
    out = {}
    for mode in ("batch_only", "expand", "hydrate", "fwd"):
        f = make_prog(tr, mode, K)
        args = (tr._graph_args(), params,
                tr._put(anchors, None, tr.axis), tr._put(rngs))
        _ = int(np.asarray(f(*args)))
        best = float("inf")
        for _t in range(2):
            t0 = time.perf_counter()
            _ = int(np.asarray(f(*args)))
            best = min(best, (time.perf_counter() - t0) / K)
        out[mode] = best * 1e3
    return out


def main():
    for name, n, e in (("100k", 100_000, 2_000_000),
                       ("3M", 3_000_000, 20_000_000)):
        tr, _n, _shape = build_trainer(n, e, True, 500)
        res = run(tr, n)
        print(name, {k: round(v, 3) for k, v in res.items()}, flush=True)
        del tr


def main12():
    tr, _n, _shape = build_trainer(12_000_000, 60_000_000, True, 200)
    res = run(tr, 12_000_000, K=200)
    print("12M", {k: round(v, 3) for k, v in res.items()}, flush=True)


if __name__ == "__main__":
    if "--12m" in sys.argv:
        main12()
    else:
        main()
