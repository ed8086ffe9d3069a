"""GCS backends for the ``gs://`` URI scheme.

Ref parity: `python/gigl/common/utils/gcs.py` (481 LoC GcsUtils: blob
read/write/exists/delete/list) + `src/common/utils/file_loader.py` copy
semantics. The reference talks to google-cloud-storage directly; here the
backend is pluggable behind ``GcsUri.register_backend`` so the same
pipeline code runs

  - against real GCS via fsspec/gcsfs when installed
    (``register_gcs_backend()``),
  - against the in-memory fake in tests / egress-free environments
    (``InMemoryGcsBackend`` — the moto/fake-gcs-server analog).

Backend protocol (see data/uri.py GcsUri): read_bytes / write_bytes /
exists / delete / list, all taking full ``gs://bucket/path`` strings.
"""

from __future__ import annotations

from typing import Dict, List

from gigl_tpu.data.uri import GcsUri


def _split(uri: str):
    rest = uri[len("gs://"):]
    parts = rest.split("/", 1)
    return parts[0], (parts[1] if len(parts) > 1 else "")


class InMemoryGcsBackend:
    """Fake GCS: a flat blob map with prefix listing — enough to exercise
    every FileLoader/GcsUri operation offline (unit tests, dry runs)."""

    def __init__(self):
        self.blobs: Dict[str, bytes] = {}

    def read_bytes(self, uri: str) -> bytes:
        if uri not in self.blobs:
            raise FileNotFoundError(uri)
        return self.blobs[uri]

    def write_bytes(self, uri: str, data: bytes) -> None:
        self.blobs[uri] = bytes(data)

    def exists(self, uri: str) -> bool:
        if uri in self.blobs:
            return True
        prefix = uri.rstrip("/") + "/"
        return any(k.startswith(prefix) for k in self.blobs)

    def delete(self, uri: str) -> None:
        prefix = uri.rstrip("/") + "/"
        for k in [k for k in self.blobs
                  if k == uri or k.startswith(prefix)]:
            del self.blobs[k]

    def list(self, uri: str) -> List[str]:
        """Immediate children of a 'directory' prefix (GCS delimiter
        semantics: one path segment past the prefix)."""
        prefix = uri.rstrip("/") + "/"
        out = set()
        for k in self.blobs:
            if not k.startswith(prefix):
                continue
            head = k[len(prefix):].split("/", 1)[0]
            out.add(prefix + head)
        return sorted(out)


class FsspecGcsBackend:
    """Real-GCS backend over fsspec/gcsfs (importable only when the
    environment ships them; the default image does not — the reference's
    google-cloud-storage dependency has the same property)."""

    def __init__(self, **fs_kwargs):
        try:
            import gcsfs  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without gcsfs
            raise ImportError(
                "FsspecGcsBackend needs gcsfs (pip install gcsfs); in "
                "egress-free environments use InMemoryGcsBackend or local "
                "paths") from e
        import fsspec

        self.fs = fsspec.filesystem("gs", **fs_kwargs)

    @staticmethod
    def _key(uri: str) -> str:
        return uri[len("gs://"):]

    def read_bytes(self, uri: str) -> bytes:  # pragma: no cover - needs GCS
        with self.fs.open(self._key(uri), "rb") as f:
            return f.read()

    def write_bytes(self, uri: str, data) -> None:  # pragma: no cover
        with self.fs.open(self._key(uri), "wb") as f:
            f.write(data)

    def exists(self, uri: str) -> bool:  # pragma: no cover - needs GCS
        return self.fs.exists(self._key(uri))

    def delete(self, uri: str) -> None:  # pragma: no cover - needs GCS
        self.fs.rm(self._key(uri), recursive=True)

    def list(self, uri: str) -> List[str]:  # pragma: no cover - needs GCS
        return [f"gs://{p}" for p in self.fs.ls(self._key(uri))]


def register_gcs_backend(backend=None, **fs_kwargs) -> None:
    """Install a gs:// backend. With no argument, builds the fsspec/gcsfs
    backend (raises ImportError with guidance when gcsfs is absent)."""
    if backend is None:
        backend = FsspecGcsBackend(**fs_kwargs)
    GcsUri.register_backend(backend)
