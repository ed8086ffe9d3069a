"""gs:// scheme backend (data/gcs.py) exercising FileLoader copy semantics
through the registered-backend hook — ref common/utils/gcs.py +
file_loader.py contract, run against the in-memory fake (the environment
has no cloud egress; the fsspec backend raises with guidance)."""

import numpy as np
import pytest

from gigl_tpu.data.gcs import (
    FsspecGcsBackend,
    InMemoryGcsBackend,
    register_gcs_backend,
)
from gigl_tpu.data.uri import FileLoader, GcsUri, UriFactory


@pytest.fixture()
def fake_gcs():
    backend = InMemoryGcsBackend()
    register_gcs_backend(backend)
    yield backend
    GcsUri.register_backend(None)


class TestUriFactoryRouting:
    def test_gs_uris_route_to_gcsuri(self):
        u = UriFactory.create("gs://bucket/a/b.txt")
        assert isinstance(u, GcsUri)
        assert u.bucket == "bucket"
        assert u.blob_path == "a/b.txt"

    def test_unregistered_backend_raises_with_guidance(self):
        GcsUri.register_backend(None)
        with pytest.raises(RuntimeError, match="No GCS backend"):
            UriFactory.create("gs://bucket/x").read_bytes()


class TestInMemoryBackend:
    def test_round_trip_and_exists(self, fake_gcs):
        u = UriFactory.create("gs://b/data/x.bin")
        payload = np.arange(16, dtype=np.int32).tobytes()
        u.write_bytes(payload)
        assert u.exists()
        assert u.read_bytes() == payload
        u.delete()
        assert not u.exists()

    def test_list_children_delimiter_semantics(self, fake_gcs):
        for p in ["gs://b/d/a.txt", "gs://b/d/sub/x.txt",
                  "gs://b/d/sub/y.txt", "gs://b/other/z.txt"]:
            UriFactory.create(p).write_bytes(b"1")
        kids = [str(c) for c in UriFactory.create("gs://b/d").list_children()]
        assert kids == ["gs://b/d/a.txt", "gs://b/d/sub"]

    def test_prefix_delete_is_recursive(self, fake_gcs):
        for p in ["gs://b/d/a", "gs://b/d/sub/x"]:
            UriFactory.create(p).write_bytes(b"1")
        UriFactory.create("gs://b/d").delete()
        assert not UriFactory.create("gs://b/d/a").exists()
        assert not UriFactory.create("gs://b/d/sub/x").exists()


class TestFileLoaderAcrossSchemes:
    def test_local_to_gs_to_local(self, fake_gcs, tmp_path):
        src = tmp_path / "in.txt"
        src.write_text("payload-123")
        fl = FileLoader()
        fl.copy(str(src), "gs://b/stage/in.txt")
        assert fl.exists("gs://b/stage/in.txt")
        dst = tmp_path / "out" / "back.txt"
        fl.copy("gs://b/stage/in.txt", str(dst))
        assert dst.read_text() == "payload-123"
        fl.delete("gs://b/stage/in.txt")
        assert not fl.exists("gs://b/stage/in.txt")

    def test_yaml_config_round_trip_through_gs(self, fake_gcs):
        """A frozen task config written to gs:// reloads identically —
        the inter-stage hand-off contract every pipeline stage relies on."""
        from gigl_tpu.data.mocking import mocked_task_config

        cfg = mocked_task_config("toy_graph_node_anchor_lp")
        u = UriFactory.create("gs://b/configs/frozen.yaml")
        u.write_text(cfg.to_yaml())
        from gigl_tpu.config.task_config import TaskConfig

        cfg2 = TaskConfig.from_yaml(u.read_text())
        assert cfg2.to_yaml() == cfg.to_yaml()


class TestFsspecBackend:
    def test_constructs_and_registers(self):
        """gcsfs ships in this image: the real backend must construct and
        install (network operations would need egress + credentials; the
        object build does not)."""
        try:
            register_gcs_backend(token="anon")
        finally:
            backend = GcsUri._backend
            GcsUri.register_backend(None)
        assert isinstance(backend, FsspecGcsBackend)
        assert backend._key("gs://b/x") == "b/x"
