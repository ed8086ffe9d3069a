"""Resource configuration: machine shapes per pipeline component.

Ref parity: `proto/snapchat/research/gbml/gigl_resource_config.proto:171-195`
GiglResourceConfig — per-component resource shapes (preprocessor Dataflow
workers, SGS/SplitGen Spark clusters, trainer/inferencer VAI machines). The
TPU-native equivalent describes TPU mesh topology per stage instead of GCP
machine types; cloud fields are retained as passthrough metadata for
orchestration adapters.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, Mapping, Optional, Tuple

import yaml


@dataclass
class TpuResource:
    """A TPU slice shape for one component.

    mesh_axes/mesh_shape define the logical device mesh: e.g.
    axes=("data", "model"), shape=(8, 1) for pure data parallelism over 8
    chips. Replaces the reference's VertexAiResourceConfig
    (gigl_resource_config.proto:40-56: machine_type/gpu_type/num_replicas).
    """

    num_hosts: int = 1
    chips_per_host: int = 8
    mesh_axes: Tuple[str, ...] = ("data",)
    mesh_shape: Tuple[int, ...] = ()

    def __post_init__(self):
        self.mesh_axes = tuple(self.mesh_axes)
        self.mesh_shape = tuple(int(s) for s in self.mesh_shape)
        if not self.mesh_shape:
            self.mesh_shape = (self.num_hosts * self.chips_per_host,) + (1,) * (
                len(self.mesh_axes) - 1
            )
        if len(self.mesh_shape) != len(self.mesh_axes):
            raise ValueError(
                f"mesh_shape {self.mesh_shape} rank != mesh_axes {self.mesh_axes}"
            )

    @property
    def num_devices(self) -> int:
        n = 1
        for s in self.mesh_shape:
            n *= s
        return n

    def to_dict(self) -> dict:
        return {
            "num_hosts": self.num_hosts,
            "chips_per_host": self.chips_per_host,
            "mesh_axes": list(self.mesh_axes),
            "mesh_shape": list(self.mesh_shape),
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "TpuResource":
        return cls(
            num_hosts=int(d.get("num_hosts", 1)),
            chips_per_host=int(d.get("chips_per_host", 8)),
            mesh_axes=tuple(d.get("mesh_axes", ("data",))),
            mesh_shape=tuple(d.get("mesh_shape", ())),
        )


@dataclass
class HostResource:
    """CPU-side resources for host pipeline stages (preprocess, IO).

    Replaces DataflowResourceConfig / SparkResourceConfig
    (gigl_resource_config.proto:28-37, :18-25).
    """

    num_workers: int = 1
    num_threads: int = 8
    memory_gb: int = 32

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Mapping) -> "HostResource":
        return cls(**dict(d))


@dataclass
class ResourceConfig:
    """Per-component resource shapes + shared cloud metadata.

    Ref parity: GiglResourceConfig (gigl_resource_config.proto:171-195):
    shared_resource_config (project/region/temp paths/labels) + per-component
    configs. ``shared_args`` carries project/region/staging-path metadata.
    """

    preprocessor: HostResource = field(default_factory=HostResource)
    sampler: HostResource = field(default_factory=HostResource)
    trainer: TpuResource = field(default_factory=TpuResource)
    inferencer: TpuResource = field(default_factory=TpuResource)
    shared_args: Dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "preprocessor": self.preprocessor.to_dict(),
            "sampler": self.sampler.to_dict(),
            "trainer": self.trainer.to_dict(),
            "inferencer": self.inferencer.to_dict(),
            "shared_args": dict(self.shared_args),
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "ResourceConfig":
        return cls(
            preprocessor=HostResource.from_dict(d.get("preprocessor", {})),
            sampler=HostResource.from_dict(d.get("sampler", {})),
            trainer=TpuResource.from_dict(d.get("trainer", {})),
            inferencer=TpuResource.from_dict(d.get("inferencer", {})),
            shared_args=dict(d.get("shared_args", {})),
        )

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    @classmethod
    def from_yaml(cls, text: str) -> "ResourceConfig":
        return cls.from_dict(yaml.safe_load(text))

    def save(self, path: str) -> None:
        from gigl_tpu.data.uri import UriFactory

        UriFactory.create(path).write_text(self.to_yaml())

    @classmethod
    def load(cls, path: str) -> "ResourceConfig":
        from gigl_tpu.data.uri import UriFactory

        return cls.from_yaml(UriFactory.create(path).read_text())
