"""Find the per-step O(N) cost: dump the compiled HLO of the partitioned
tabularized train_steps program at N=1M and list ops whose output shape
scales with N (copies/transposes/fusions over the big tables inside the
scan body would explain a step time linear in N)."""

import re
import sys
import types

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from largen_probe2 import build_trainer  # noqa: E402


def main(N=1_000_000, E=10_000_000):
    import jax

    tr, _n, (B, R, F) = build_trainer(N, E, True, 8)
    state = tr.init_state(jax.random.PRNGKey(0), batch_size=B)
    anchors = (np.arange(B * 8).reshape(8, B) % N).astype(np.int32)
    rngs = np.asarray(jax.random.split(jax.random.PRNGKey(1), 8))
    lowered = tr._train_steps.lower(
        tr._graph_args(), state, tr._put(anchors, None, tr.axis),
        tr._put(rngs))
    txt = lowered.compile().as_text()
    open("/tmp/step_hlo.txt", "w").write(txt)
    # Ops with an output dim >= N/2 (i.e. table-sized intermediates).
    big = re.compile(r"(\d[\d,]*)\]")
    interesting = []
    for line in txt.splitlines():
        line = line.strip()
        m = re.findall(r"\b([a-z0-9_.\-]+)\s*=\s*(\w+)\[([0-9,]+)\]",
                       line)
        for name, dtype_shape, shape in m:
            dims = [int(x) for x in shape.split(",") if x]
            if any(d >= N // 2 for d in dims):
                op = line.split("=", 1)[1].strip()[:140]
                interesting.append(f"{name}: {op}")
    # Dedup by op kind.
    seen = set()
    for ln in interesting:
        kind = re.sub(r"[0-9,\[\]]+", "", ln.split("(")[0])
        if kind in seen:
            continue
        seen.add(kind)
        print(ln)
    print(f"# total table-sized ops: {len(interesting)}")


if __name__ == "__main__":
    main()
