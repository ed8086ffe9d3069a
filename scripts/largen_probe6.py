"""Probe 6: the 12M 'cliff' decomposes as step_time(K) = t + C/K with
C ~ 560 ms per chunk (probe5: K=200 -> 3.37 ms/step, K=500 -> 1.70).
Confirm by measuring K=1000/2000, identify C as entry-layout copies of
the big table arguments (probe3's HLO shows s8[N,268] and s32[N,15]
copies at ENTRY), and test the fix: device_put the graph args into the
compiled executable's OWN input formats once, so per-call copies vanish.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from largen_probe2 import build_trainer  # noqa: E402


def time_steps(tr, N, K, trials=2, graph_args=None):
    import jax

    B = 512
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
    anchors = (np.arange(B * K).reshape(K, B) * 2654435761 % N).astype(
        np.int32)
    ga = graph_args if graph_args is not None else tr._graph_args()
    a_put = tr._put(anchors, None, tr.axis)
    rngs = tr._put(np.asarray(jax.random.split(jax.random.PRNGKey(1), K)))
    state, losses, _ = tr._train_steps(ga, state, a_put, rngs)
    _ = float(np.asarray(losses)[-1])
    best = float("inf")
    for _t in range(trials):
        rngs = tr._put(np.asarray(
            jax.random.split(jax.random.PRNGKey(2 + _t), K)))
        t0 = time.perf_counter()
        state, losses, _ = tr._train_steps(ga, state, a_put, rngs)
        _ = float(np.asarray(losses)[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    del state
    return best


def main(N=12_000_000, E=60_000_000):
    import jax

    tr, _n, _shape = build_trainer(N, E, True, 500)
    for K in (250, 1000):
        dt = time_steps(tr, N, K)
        print(f"K={K}: {dt*1e3:.3f} ms/step", flush=True)

    # Layout fix: query the compiled executable's input formats and
    # re-device_put the graph args into exactly those formats.
    B = 512
    K = 250
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
    anchors = (np.arange(B * K).reshape(K, B) % N).astype(np.int32)
    rngs = np.asarray(jax.random.split(jax.random.PRNGKey(1), K))
    ga = tr._graph_args()
    lowered = tr._train_steps.lower(ga, state, tr._put(anchors, None,
                                                       tr.axis),
                                    tr._put(rngs))
    compiled = lowered.compile()
    try:
        fmts = compiled.input_formats
    except AttributeError:
        fmts = getattr(compiled, "input_layouts", None)
    print("formats api:", type(fmts), flush=True)
    if fmts is not None:
        ga_fmts = fmts[0][0]  # args tree: (graph_args, state, anchors, rngs)
        ga2 = jax.tree_util.tree_map(
            lambda x, f: jax.device_put(x, f), ga, ga_fmts)
        jax.block_until_ready(ga2)
        del state
        dt = time_steps(tr, N, 250, graph_args=ga2)
        print(f"K=250 with format-matched args: {dt*1e3:.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
