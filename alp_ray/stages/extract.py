"""Corpus → edge-table stages (map_batches callables, pyarrow batch format).

≙ reference ingestion path: ``utils::MatrixFileReader`` text parsing →
``buildMatrixUnique`` (base/io.hpp:1336-1454) — but here the "file format" is
the Parquet code corpus and the nonzero stream is the import-edge stream
extracted per language.

All stages are callable CLASSES intended for
``ds.map_batches(Cls, concurrency=N, batch_format="pyarrow")`` — compiled
regexes and hashers are built once per actor in ``__init__``, not per batch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class Sha256Stage:
    """Pass-through stage adding ``sha256(content)`` per row.

    The north-rule per-row invariant: any pass-through stage must preserve
    ``content`` byte-exactly; tests verify the digest column is unchanged
    across a round-trip (BASELINE.json input_hint).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch.column("content")
        digests = [
            hashlib.sha256(s.as_py().encode("utf-8")).hexdigest()
            for s in content
        ]
        return batch.append_column("sha256", pa.array(digests, pa.string()))


class ImportExtractor:
    """Extract per-language import edges: corpus rows → ``(repo, src_path,
    dst_path)``. Patterns are compiled once per actor.

    Languages: ``py`` (``import a.b.c`` → ``a/b/c.py``), ``js``
    (``require('./<path>')``), ``c`` (``#include "<path>"``). Unknown langs
    yield no edges. Resolution is within-repo by construction.
    """

    def __init__(self) -> None:
        self._py = re.compile(r"^import ([\w.]+)\s*$", re.MULTILINE)
        self._js = re.compile(r"require\('\./([^']+)'\)")
        self._c = re.compile(r'^#include "([^"]+)"\s*$', re.MULTILINE)

    def _targets(self, lang: str, content: str) -> list[str]:
        if lang == "py":
            return [
                m.group(1).replace(".", "/") + ".py"
                for m in self._py.finditer(content)
            ]
        if lang == "js":
            return [m.group(1) for m in self._js.finditer(content)]
        if lang == "c":
            return [m.group(1) for m in self._c.finditer(content)]
        return []

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos_out: list[str] = []
        srcs: list[str] = []
        dsts: list[str] = []
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        langs = batch.column("lang").to_pylist()
        contents = batch.column("content").to_pylist()
        for repo, path, lang, content in zip(repos, paths, langs, contents):
            for dst in self._targets(lang, content):
                repos_out.append(repo)
                srcs.append(path)
                dsts.append(dst)
        return pa.table(
            {
                "repo": pa.array(repos_out, pa.string()),
                "src_path": pa.array(srcs, pa.string()),
                "dst_path": pa.array(dsts, pa.string()),
            }
        )


def _stable_id(repo: str, path: str) -> int:
    """64-bit stable vertex id for (repo, path) — blake2b, collision
    probability ~n²/2⁶⁵ (negligible below ~10⁹ files per analysis scope;
    dense remap happens inside the shard engine anyway)."""
    h = hashlib.blake2b(
        repo.encode() + b"\x00" + path.encode(), digest_size=8
    ).digest()
    return int.from_bytes(h, "little", signed=True)


def add_vertex_ids(batch: pa.Table) -> pa.Table:
    """(repo, src_path, dst_path) → append ``src``/``dst`` int64 hash ids."""
    repos = batch.column("repo").to_pylist()
    srcs = batch.column("src_path").to_pylist()
    dsts = batch.column("dst_path").to_pylist()
    src_ids = np.fromiter(
        (_stable_id(r, p) for r, p in zip(repos, srcs)),
        dtype=np.int64,
        count=len(repos),
    )
    dst_ids = np.fromiter(
        (_stable_id(r, p) for r, p in zip(repos, dsts)),
        dtype=np.int64,
        count=len(repos),
    )
    return batch.append_column("src", pa.array(src_ids)).append_column(
        "dst", pa.array(dst_ids)
    )


def content_passthrough_roundtrip(batch: pa.Table) -> pa.Table:
    """A deliberately non-trivial pass-through transform (re-encode +
    column shuffle) used by tests to prove the sha256 invariant holds."""
    cols = {name: batch.column(name) for name in batch.column_names}
    # Round-trip content through a cast (no-op semantically).
    cols["content"] = pc.cast(cols["content"], pa.string())
    order = sorted(cols)
    return pa.table({k: cols[k] for k in order})
