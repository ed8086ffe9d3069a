"""URI abstraction for asset addressing (local / GCS / HTTP).

Ref parity: `python/gigl/common/types/uri/uri.py:1-85` Uri hierarchy +
UriFactory; `python/gigl/src/common/utils/file_loader.py` FileLoader copy
semantics. The reference uses these polymorphic URIs for *every* inter-stage
asset hand-off; this framework keeps that contract.

Cloud backends are pluggable: `register_scheme` installs a handler for e.g.
``gs://`` (the default environment has no cloud egress, so GCS operations
raise unless a handler is registered — tests and local runs use LocalUri).
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Callable, Dict, List, Optional, Type, Union


class Uri:
    """Base asset address. Subclasses implement IO."""

    scheme: str = ""

    def __init__(self, uri: Union[str, "Uri", Path]):
        self._uri = str(uri)

    @property
    def uri(self) -> str:
        return self._uri

    def __str__(self) -> str:
        return self._uri

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self._uri!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Uri) and self._uri == other._uri

    def __hash__(self) -> int:
        return hash(self._uri)

    def join(self, *parts: str) -> "Uri":
        base = self._uri.rstrip("/")
        tail = "/".join(p.strip("/") for p in parts)
        return type(self)(f"{base}/{tail}")

    # -- abstract IO -----------------------------------------------------------
    def read_bytes(self) -> bytes:
        raise NotImplementedError

    def write_bytes(self, data: bytes) -> None:
        raise NotImplementedError

    def read_text(self, encoding: str = "utf-8") -> str:
        return self.read_bytes().decode(encoding)

    def write_text(self, text: str, encoding: str = "utf-8") -> None:
        self.write_bytes(text.encode(encoding))

    def exists(self) -> bool:
        raise NotImplementedError

    def delete(self) -> None:
        raise NotImplementedError

    def list_children(self) -> List["Uri"]:
        raise NotImplementedError

    def is_valid(self) -> bool:
        raise NotImplementedError


class LocalUri(Uri):
    scheme = "file"

    @property
    def path(self) -> Path:
        p = self._uri
        if p.startswith("file://"):
            p = p[len("file://"):]
        return Path(p)

    def is_valid(self) -> bool:
        return True

    def read_bytes(self) -> bytes:
        return self.path.read_bytes()

    def write_bytes(self, data: bytes) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_bytes(data)

    def exists(self) -> bool:
        return self.path.exists()

    def delete(self) -> None:
        p = self.path
        if p.is_dir():
            shutil.rmtree(p)
        elif p.exists():
            p.unlink()

    def list_children(self) -> List["Uri"]:
        p = self.path
        if not p.is_dir():
            return []
        return [LocalUri(str(c)) for c in sorted(p.iterdir())]


class HttpUri(Uri):
    """Read-only HTTP(S) asset (ref: common/types/uri/http_uri.py)."""

    scheme = "http"

    def is_valid(self) -> bool:
        return self._uri.startswith(("http://", "https://"))

    def read_bytes(self) -> bytes:
        import urllib.request

        with urllib.request.urlopen(self._uri) as r:  # noqa: S310
            return r.read()

    def exists(self) -> bool:
        try:
            self.read_bytes()
            return True
        except Exception:
            return False


class GcsUri(Uri):
    """``gs://bucket/path`` asset. Operations delegate to a registered
    backend handler (none by default in an egress-free environment)."""

    scheme = "gs"
    _backend: Optional[object] = None

    @classmethod
    def register_backend(cls, backend) -> None:
        """Backend must provide read_bytes/write_bytes/exists/delete/list(uri)."""
        cls._backend = backend

    def is_valid(self) -> bool:
        return self._uri.startswith("gs://")

    @property
    def bucket(self) -> str:
        return self._uri[len("gs://"):].split("/", 1)[0]

    @property
    def blob_path(self) -> str:
        rest = self._uri[len("gs://"):].split("/", 1)
        return rest[1] if len(rest) > 1 else ""

    def _require_backend(self):
        if GcsUri._backend is None:
            raise RuntimeError(
                "No GCS backend registered (environment has no cloud egress). "
                "Call GcsUri.register_backend(...) or use local paths."
            )
        return GcsUri._backend

    def read_bytes(self) -> bytes:
        return self._require_backend().read_bytes(self._uri)

    def write_bytes(self, data: bytes) -> None:
        self._require_backend().write_bytes(self._uri, data)

    def exists(self) -> bool:
        return self._require_backend().exists(self._uri)

    def delete(self) -> None:
        self._require_backend().delete(self._uri)

    def list_children(self) -> List["Uri"]:
        return [GcsUri(u) for u in self._require_backend().list(self._uri)]


_SCHEMES: Dict[str, Type[Uri]] = {}


def register_scheme(prefix: str, cls: Type[Uri]) -> None:
    _SCHEMES[prefix] = cls


register_scheme("gs://", GcsUri)
register_scheme("http://", HttpUri)
register_scheme("https://", HttpUri)


class UriFactory:
    """Ref parity: common/types/uri/uri_factory.py UriFactory.create_uri."""

    @staticmethod
    def create(uri: Union[str, Uri, Path]) -> Uri:
        if isinstance(uri, Uri):
            return uri
        s = str(uri)
        for prefix, cls in _SCHEMES.items():
            if s.startswith(prefix):
                return cls(s)
        return LocalUri(s)


class FileLoader:
    """Copy/delete assets across URI schemes.

    Ref parity: `python/gigl/src/common/utils/file_loader.py` (274 LoC) —
    load/copy between local and cloud storage.
    """

    def copy(self, src: Union[str, Uri], dst: Union[str, Uri]) -> None:
        src_u, dst_u = UriFactory.create(src), UriFactory.create(dst)
        if isinstance(src_u, LocalUri) and isinstance(dst_u, LocalUri):
            dst_u.path.parent.mkdir(parents=True, exist_ok=True)
            if src_u.path.is_dir():
                shutil.copytree(src_u.path, dst_u.path, dirs_exist_ok=True)
            else:
                shutil.copy2(src_u.path, dst_u.path)
        else:
            dst_u.write_bytes(src_u.read_bytes())

    def delete(self, target: Union[str, Uri]) -> None:
        UriFactory.create(target).delete()

    def exists(self, target: Union[str, Uri]) -> bool:
        return UriFactory.create(target).exists()
