"""Typed (heterogeneous) on-device layerwise sampling over per-edge-type CSR.

TPU-native realization of the reference's SubgraphSamplingStrategy DAGs
(`proto/snapchat/research/gbml/subgraph_sampling_strategy.proto:38-84`:
per root node type a MessagePassingPath of SamplingOps, each op sampling one
edge type from the frontier produced by its parent ops) and of the GLT
heterogeneous loader (per-edge-type fanouts,
`python/gigl/distributed/distributed_neighborloader.py:26`).

Direction semantics (ref `subgraph_sampling_strategy.proto:26-29,54-58` and
`src/common/types/pb_wrappers/sampling_op.py:31-43`):
  - INCOMING: frontier nodes are of the edge type's *dst* node type; we
    sample in-edges, neighbors are of the *src* node type.
  - OUTGOING: frontier nodes are of the *src* node type; neighbors *dst*.

Everything is static-shape: the op tree is fixed at trace time (a pytree aux
structure), each op contributes a dense [B, K1..Kd] block. Tree DAGs are
supported (an op may have one parent; multiple ops may share a parent).
Multi-parent ops (true DAG merge) are rejected — on TPU a merge would break
the static block-tree shape; the reference's own validation requires
consistent frontiers per parent chain (pb_wrappers/sampling_op.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gigl_tpu.config.task_config import SamplingOp
from gigl_tpu.sampling.neighbor_sampler import DeviceCSR, sample_neighbors
from gigl_tpu.types.graph import EdgeType, NodeType


@dataclass(frozen=True)
class OpSpec:
    """Static (trace-time) description of one resolved sampling op.

    ``parent`` is the index into the op list (-1 = the root frontier).
    ``csr_key`` selects the DeviceCSR: "{edge_type}|{anchor}" where anchor is
    "dst" for INCOMING and "src" for OUTGOING.
    """

    name: str
    edge_type: str
    frontier_node_type: str  # node type the frontier must have
    neighbor_node_type: str  # node type of the sampled neighbors
    fanout: int
    parent: int
    depth: int  # 1 for root-attached ops
    direction: str  # INCOMING | OUTGOING
    method: str = "uniform"  # uniform | weighted | top_k (proto oneof)

    @property
    def anchor(self) -> str:
        return "dst" if self.direction == "INCOMING" else "src"

    @property
    def csr_key(self) -> str:
        return f"{self.edge_type}|{self.anchor}"

    @property
    def table_key(self) -> str:
        """Frozen-sample-table key. Includes the draw method so two ops
        sharing a CSR and fanout with different methods (e.g. uniform vs
        top_k) never reuse one table's draws."""
        return f"{self.csr_key}#{self.fanout}#{self.method}"


def resolve_path(
    root_node_type: str,
    ops: Sequence[SamplingOp],
) -> Tuple[OpSpec, ...]:
    """Topologically resolve a MessagePassingPath into an OpSpec tree.

    Validation mirrors the reference's MessagePassingPathPbWrapper
    (`pb_wrappers/subgraph_sampling_strategy.py:23-135`): root ops' edge type
    must touch the root node type, each op's frontier type must match its
    parent's neighbor type, fanouts positive, op names unique, DAG acyclic
    and single-parent.
    """
    by_name: Dict[str, SamplingOp] = {}
    for op in ops:
        if op.op_name in by_name:
            raise ValueError(f"duplicate sampling op name {op.op_name!r}")
        by_name[op.op_name] = op

    resolved: List[OpSpec] = []
    index: Dict[str, int] = {}

    def frontier_type(op: SamplingOp) -> Tuple[str, str]:
        et = op.edge_type
        if op.sampling_direction == "INCOMING":
            return str(et.dst_node_type), str(et.src_node_type)
        return str(et.src_node_type), str(et.dst_node_type)

    remaining = list(ops)
    progress = True
    while remaining and progress:
        progress = False
        for op in list(remaining):
            if len(op.input_op_names) > 1:
                raise ValueError(
                    f"op {op.op_name!r}: multi-parent sampling ops are not "
                    "supported on the static TPU block tree")
            if op.num_nodes_to_sample <= 0:
                raise ValueError(
                    f"op {op.op_name!r}: num_nodes_to_sample must be > 0")
            f_nt, n_nt = frontier_type(op)
            if not op.input_op_names:
                if f_nt != str(root_node_type):
                    raise ValueError(
                        f"root op {op.op_name!r} samples {op.edge_type} whose "
                        f"frontier type {f_nt!r} != root {root_node_type!r}")
                parent, depth = -1, 1
            else:
                pname = op.input_op_names[0]
                if pname not in index:
                    if pname not in by_name:
                        raise ValueError(
                            f"op {op.op_name!r}: unknown input op {pname!r}")
                    continue  # parent not resolved yet
                parent = index[pname]
                pspec = resolved[parent]
                if pspec.neighbor_node_type != f_nt:
                    raise ValueError(
                        f"op {op.op_name!r}: frontier type {f_nt!r} does not "
                        f"match parent {pname!r} neighbor type "
                        f"{pspec.neighbor_node_type!r}")
                depth = pspec.depth + 1
            index[op.op_name] = len(resolved)
            resolved.append(OpSpec(
                name=op.op_name, edge_type=str(op.edge_type),
                frontier_node_type=f_nt, neighbor_node_type=n_nt,
                fanout=int(op.num_nodes_to_sample), parent=parent,
                depth=depth, direction=op.sampling_direction,
                method=getattr(op, "sampling_method", "uniform")))
            remaining.remove(op)
            progress = True
    if remaining:
        raise ValueError(
            f"sampling DAG has a cycle or missing parents: "
            f"{[o.op_name for o in remaining]}")
    return tuple(resolved)


def chain_path(
    root_node_type: str,
    edge_type: EdgeType,
    fanouts: Sequence[int],
    direction: str = "INCOMING",
) -> Tuple[OpSpec, ...]:
    """Uniform k-hop chain over a single edge type (the ``fanouts=[15,10]``
    shorthand of the reference's config)."""
    ops = []
    prev = ()
    for i, k in enumerate(fanouts):
        ops.append(SamplingOp(
            op_name=f"hop_{i + 1}", edge_type=edge_type,
            num_nodes_to_sample=int(k), input_op_names=prev,
            sampling_direction=direction))
        prev = (f"hop_{i + 1}",)
    return resolve_path(root_node_type, ops)


@jax.tree_util.register_pytree_node_class
@dataclass
class TypedBlocks:
    """Sampled typed block tree: arrays per op, aligned with a static spec.

    ``node_ids[0]``/``masks[0]`` are the root frontier ([B], all-True mask);
    entry i+1 corresponds to ``spec[i]``. Shapes: an op at depth d whose
    ancestor fanouts are K1..Kd has node_ids [B, K1, ..., Kd].
    """

    root_node_type: str
    spec: Tuple[OpSpec, ...]
    node_ids: List[jnp.ndarray]
    masks: List[jnp.ndarray]
    edge_slots: List[Optional[jnp.ndarray]]

    def tree_flatten(self):
        n = len(self.node_ids)
        children = tuple(self.node_ids) + tuple(self.masks) + tuple(
            self.edge_slots)
        return children, (self.root_node_type, self.spec, n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        root_nt, spec, n = aux
        return cls(root_node_type=root_nt, spec=spec,
                   node_ids=list(children[:n]),
                   masks=list(children[n: 2 * n]),
                   edge_slots=list(children[2 * n:]))

    @property
    def batch_size(self) -> int:
        return self.node_ids[0].shape[0]

    def children_of(self, parent: int) -> List[int]:
        """Indices into spec of ops whose parent is ``parent`` (-1 = root)."""
        return [i for i, s in enumerate(self.spec) if s.parent == parent]


def sample_typed_blocks(
    csrs: Dict[str, DeviceCSR],
    roots: jnp.ndarray,
    root_node_type: str,
    spec: Sequence[OpSpec],
    *,
    seed: int = 0,
    method: str = "uniform",
) -> TypedBlocks:
    """Execute a resolved op tree against per-edge-type device CSRs.

    ``csrs`` is keyed by OpSpec.csr_key. jit-compatible: output shapes
    depend only on (len(roots), spec).
    """
    node_ids: List[jnp.ndarray] = [roots.astype(jnp.int32)]
    masks: List[jnp.ndarray] = [jnp.ones(roots.shape, dtype=bool)]
    edge_slots: List[Optional[jnp.ndarray]] = [None]
    for i, op in enumerate(spec):
        frontier = node_ids[op.parent + 1]
        parent_mask = masks[op.parent + 1]
        csr = csrs[op.csr_key]
        # Per-op hop salt: ops at the same depth sampling different edge
        # types must draw independent bits. Per-op method (proto oneof)
        # overrides the call-level default.
        op_method = op.method if op.method != "uniform" else method
        nbr, m, es = sample_neighbors(
            csr, frontier, op.fanout, seed=seed,
            hop=op.depth * 1_000_003 + i, method=op_method)
        m = m & parent_mask[..., None]
        nbr = jnp.where(m, nbr, 0)
        node_ids.append(nbr)
        masks.append(m)
        edge_slots.append(es)
    return TypedBlocks(root_node_type=str(root_node_type), spec=tuple(spec),
                       node_ids=node_ids, masks=masks,
                       edge_slots=edge_slots)
