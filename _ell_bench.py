import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from gigl_tpu.graph.csr import HeteroGraph
    from gigl_tpu.models.encoders import GNNEncoder
    from gigl_tpu.training.full_batch import FullBatchTrainer, full_batch_data_from_graph
    N, E, D, C = 100_000, 2_000_000, 128, 16
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E); dst = rng.integers(0, N, E)
    g = HeteroGraph.homogeneous(src=src, dst=dst, num_nodes=N,
        node_features=rng.normal(size=(N, D)).astype(np.float32),
        node_labels=rng.integers(0, C, N))
    enc = GNNEncoder(hid_dim=256, out_dim=C, num_layers=2, conv="graphsage")
    for tag, build_ell in (("ELL", True), ("COO", False)):
        data = full_batch_data_from_graph(g, build_ell=build_ell)
        tr = FullBatchTrainer(enc, data, optimizer_args={"learning_rate": "1e-2"})
        st = tr.init_state(jax.random.PRNGKey(0))
        rngk = jax.random.PRNGKey(1)
        st, loss = tr._train_step(tr.data, st, rngk)
        _ = float(loss)
        iters = 30 if build_ell else 5
        t0 = time.perf_counter()
        for _ in range(iters):
            st, loss = tr._train_step(tr.data, st, rngk)
        _ = float(loss)
        dt = (time.perf_counter()-t0)/iters
        print(f"{tag}: {dt*1e3:.2f} ms/epoch-step  {2*E/dt/1e6:.0f} M edges/s (2 layers)  loss={float(loss):.3f}")
if __name__ == "__main__":
    main()
