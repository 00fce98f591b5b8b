"""ModelDownloader — schema'd remote model repository access.

Parity: reference ``deep-learning/.../downloader/ModelDownloader.scala:
1-263`` (ModelSchema: name/dataset/modelType/uri/hash/size; local +
remote repos; hash-verified downloads).

Network access is not assumed in this container: ``download`` uses
stdlib urllib when reachable and always hash-verifies; ``local_models``
scans a local directory repo. The schema and registry logic (what the
rest of the engine consumes) are fully functional offline.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass


@dataclass
class ModelSchema:
    """deep-learning/.../downloader/Schema.scala parity."""

    name: str
    dataset: str = ""
    modelType: str = ""
    uri: str = ""
    hash: str = ""
    size: int = 0
    inputNode: str = ""
    numLayers: int = 0
    layerNames: tuple = ()

    def to_json(self) -> str:
        d = asdict(self)
        d["layerNames"] = list(d["layerNames"])
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "ModelSchema":
        d = json.loads(s)
        d["layerNames"] = tuple(d.get("layerNames") or ())
        return cls(**d)


class ModelDownloader:
    def __init__(self, local_path: str):
        self.local_path = local_path
        os.makedirs(local_path, exist_ok=True)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.local_path, f"{name}.meta.json")

    def _model_path(self, name: str) -> str:
        return os.path.join(self.local_path, f"{name}.model")

    def local_models(self) -> list[ModelSchema]:
        out = []
        for f in sorted(os.listdir(self.local_path)):
            if f.endswith(".meta.json"):
                with open(os.path.join(self.local_path, f)) as fh:
                    out.append(ModelSchema.from_json(fh.read()))
        return out

    @staticmethod
    def _sha256(path: str) -> str:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def register_local(self, schema: ModelSchema, model_bytes: bytes) -> str:
        """Store model bytes + metadata in the local repo (hash computed)."""
        path = self._model_path(schema.name)
        with open(path, "wb") as f:
            f.write(model_bytes)
        schema.hash = self._sha256(path)
        schema.size = len(model_bytes)
        with open(self._meta_path(schema.name), "w") as f:
            f.write(schema.to_json())
        return path

    def download_model(self, schema: ModelSchema) -> str:
        """Fetch schema.uri into the local repo; hash-verified
        (ModelDownloader.scala's hash check). Raises on mismatch."""
        path = self._model_path(schema.name)
        if os.path.exists(path) and (not schema.hash
                                     or self._sha256(path) == schema.hash):
            return path
        import urllib.request

        # download to a temp path + atomic rename: writing straight to
        # the final path leaves an interrupted download as a partial
        # file that a later hash-less lookup would serve as a cache hit
        tmp = path + ".part"
        try:
            urllib.request.urlretrieve(schema.uri, tmp)  # noqa: S310
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        if schema.hash and self._sha256(tmp) != schema.hash:
            os.remove(tmp)
            raise IOError(f"hash mismatch for model {schema.name}")
        os.replace(tmp, path)
        with open(self._meta_path(schema.name), "w") as f:
            f.write(schema.to_json())
        return path
