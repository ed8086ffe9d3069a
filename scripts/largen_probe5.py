"""Probe 5: the 12M cliff lives in the BACKWARD pass (probe4: fwd
0.44 ms, full step 3.23 ms at 12M vs backward ~0.2 ms at 100k).
Bisect it: grad of encode-only vs grad of the full loss vs the full
step (grad + optimizer), at N=12M, K=500.
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
            if mode == "grad_encode":
                def f(p):
                    batch, _ = tr._make_batch(g, a, step)
                    groups = [(batch.anchors, 0), (batch.pos, 1),
                              (batch.random_neg, 2)]
                    embs, _o = tr._encode_groups(g, p, groups,
                                                 train=True, rng=rng)
                    return sum(jnp.sum(e.astype(jnp.float32))
                               for e in embs)
            else:  # grad_loss
                def f(p):
                    loss, _aux = tr._loss_local(g, p, None, a, step, rng)
                    return loss
            val, grads = jax.value_and_grad(f)(params)
            leaf = jax.tree_util.tree_leaves(grads)[0]
            return acc + val + jnp.sum(leaf).astype(jnp.float32), None

        steps = jnp.arange(K, dtype=jnp.int32)
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), (anchors_kb, steps, rngs))
        return acc

    return jax.jit(jax.shard_map(
        local, mesh=tr.mesh,
        in_specs=(gspec, P(), P(None, axis), P()),
        out_specs=P(), check_vma=False))


def main(N=12_000_000, E=60_000_000, K=500):
    import jax

    tr, _n, _shape = build_trainer(N, E, True, K)
    B = 512
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
    params = state.params
    anchors = (np.arange(B * K).reshape(K, B) * 2654435761 % N).astype(
        np.int32)
    rngs = np.asarray(jax.random.split(jax.random.PRNGKey(1), K))
    for mode in ("grad_encode", "grad_loss"):
        f = make_prog(tr, mode, K)
        args = (tr._graph_args(), params,
                tr._put(anchors, None, tr.axis), tr._put(rngs))
        _ = float(np.asarray(f(*args)))
        best = float("inf")
        for _t in range(2):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(*args)))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{mode}: {best*1e3:.3f} ms/step", flush=True)
    # Reference: the true full step at the same K.
    del state
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
    state, losses = tr.train_steps(state, anchors, jax.random.PRNGKey(1))
    _ = float(np.asarray(losses)[-1])
    best = float("inf")
    for _t in range(2):
        t0 = time.perf_counter()
        state, losses = tr.train_steps(state, anchors,
                                       jax.random.PRNGKey(2))
        _ = float(np.asarray(losses)[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"full step: {best*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
