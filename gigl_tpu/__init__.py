"""gigl_tpu: TPU-native framework for billion-edge-scale GNN training and
inference, with the capability surface of snap-research/GiGL re-designed for
JAX/XLA/Pallas/pjit (see SURVEY.md for the reference structural analysis)."""

__version__ = "0.1.0"
