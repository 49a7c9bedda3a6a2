"""MatrixMarket / SNAP edge-list readers → edge Datasets.

≙ the reference's file-ingestion path: ``utils::MatrixFileReader``
(include/graphblas/utils/parser/MatrixFileReader.hpp:41; header /
pattern / symmetric handling MatrixFileProperties.hpp:79-105) and the
pthreads-parallel ``hpparser`` (src/graphblas/utils/hpparser.c:131-210,
worker threads each claim a byte range and align to line boundaries).

Design: the tiny header is read driver-side; the nonzero BODY is split
into byte ranges parsed in parallel map_batches tasks — each task seeks
its range start, skips the partial first line (owned by the previous
range), and reads through the first newline past its range end. This is
exactly hpparser's chunking rule, so every line is parsed exactly once
with no driver materialization of the body.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data


@dataclass
class MatrixMarketInfo:
    nrows: int
    ncols: int
    nnz_stored: int
    pattern: bool
    symmetric: bool


def _parse_mm_header(path: str) -> tuple[MatrixMarketInfo, int]:
    """Returns (info, body_start_offset). Reads only the header bytes."""
    with open(path, "rb") as f:
        first = f.readline()
        if not first.startswith(b"%%MatrixMarket"):
            raise ValueError(f"{path}: not a MatrixMarket file")
        toks = first.decode().split()
        # %%MatrixMarket matrix coordinate <field> <symmetry>
        if len(toks) < 5 or toks[2] != "coordinate":
            raise ValueError(
                f"{path}: only 'matrix coordinate' supported ({toks})"
            )
        field = toks[3].lower()
        symmetry = toks[4].lower()
        if symmetry not in ("general", "symmetric"):
            raise ValueError(f"{path}: unsupported symmetry {symmetry}")
        while True:
            pos = f.tell()
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: missing size line")
            if line.startswith(b"%") or not line.strip():
                continue
            nrows, ncols, nnz = (int(x) for x in line.split()[:3])
            body_start = f.tell()
            break
    return (
        MatrixMarketInfo(
            nrows=nrows,
            ncols=ncols,
            nnz_stored=nnz,
            pattern=field == "pattern",
            symmetric=symmetry == "symmetric",
        ),
        body_start,
    )


def _byte_ranges(
    path: str, body_start: int, target_chunk: int
) -> list[dict]:
    size = os.path.getsize(path)
    if size <= body_start:
        return []
    n_chunks = max(1, (size - body_start) // max(target_chunk, 1))
    bounds = np.linspace(body_start, size, int(n_chunks) + 1, dtype=np.int64)
    return [
        {"start": int(bounds[i]), "end": int(bounds[i + 1])}
        for i in range(len(bounds) - 1)
        if bounds[i + 1] > bounds[i]
    ]


class _ChunkParser:
    """Parse the numeric lines of one byte range (hpparser chunk rule:
    skip the partial first line unless the range starts the body; read
    through the first newline past the end)."""

    def __init__(
        self,
        path: str,
        body_start: int,
        pattern: bool,
        comment: bytes = b"%",
        one_based: bool = True,
    ) -> None:
        self.path = path
        self.body_start = body_start
        self.pattern = pattern
        self.comment = comment.decode()
        self.one_based = one_based

    def _read_range(self, start: int, end: int) -> bytes:
        """A chunk owns exactly the lines whose FIRST byte lies in
        [start, end) — the hpparser ownership rule, so every line is
        parsed exactly once across chunks."""
        with open(self.path, "rb") as f:
            if start > self.body_start:
                f.seek(start - 1)
                if f.read(1) != b"\n":
                    # A line begins before `start`; its owner is the
                    # previous chunk — skip to its end.
                    f.readline()
                # else: a line starts exactly at `start` — ours.
            else:
                f.seek(start)
            out = []
            while f.tell() < end:
                line = f.readline()
                if not line:
                    break
                out.append(line)
        return b"".join(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        starts = batch.column("start").to_pylist()
        ends = batch.column("end").to_pylist()
        frames = []
        for s, e in zip(starts, ends):
            data = self._read_range(s, e)
            if not data.strip():
                continue
            df = pd.read_csv(
                io.BytesIO(data),
                sep=r"\s+",
                header=None,
                comment=self.comment,
                dtype=np.float64,
                engine="c",
            )
            frames.append(df)
        if not frames:
            cols = {"src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64())}
            if not self.pattern:
                cols["weight"] = pa.array([], pa.float64())
            return pa.table(cols)
        df = pd.concat(frames, ignore_index=True)
        base = 1 if self.one_based else 0
        src = df[0].to_numpy(np.int64) - base
        dst = df[1].to_numpy(np.int64) - base
        cols = {"src": pa.array(src), "dst": pa.array(dst)}
        if not self.pattern:
            if df.shape[1] > 2:
                cols["weight"] = pa.array(df[2].to_numpy(np.float64))
            else:
                cols["weight"] = pa.array(np.ones(src.size))
        return pa.table(cols)


def read_matrix_market(
    path: str, target_chunk: int = 32 << 20
) -> tuple["ray.data.Dataset", MatrixMarketInfo]:
    """MatrixMarket coordinate file → (edge Dataset, info).

    Pattern files yield (src, dst); valued files add ``weight``.
    Symmetric files are expanded (mirror entries, diagonal kept once) —
    ≙ MatrixFileProperties' symmetric handling. Indices are converted
    to 0-based."""
    info, body_start = _parse_mm_header(path)
    ranges = _byte_ranges(path, body_start, target_chunk)
    if not ranges:
        cols = {"src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64())}
        if not info.pattern:
            cols["weight"] = pa.array([], pa.float64())
        return ray.data.from_arrow(pa.table(cols)), info
    ds = ray.data.from_items(ranges).map_batches(
        _ChunkParser(path, body_start, info.pattern),
        batch_format="pyarrow",
        batch_size=1,
    )
    if info.symmetric:

        def mirror(batch: pa.Table) -> pa.Table:
            src = np.asarray(batch.column("src"), np.int64)
            dst = np.asarray(batch.column("dst"), np.int64)
            off = src != dst
            cols = {
                "src": pa.array(np.concatenate([src, dst[off]])),
                "dst": pa.array(np.concatenate([dst, src[off]])),
            }
            if "weight" in batch.column_names:
                w = np.asarray(batch.column("weight"), np.float64)
                cols["weight"] = pa.array(np.concatenate([w, w[off]]))
            return pa.table(cols)

        ds = ds.map_batches(mirror, batch_format="pyarrow")
    return ds, info


def read_snap_edges(
    path: str, target_chunk: int = 32 << 20
) -> "ray.data.Dataset":
    """SNAP-style edge list ('#' comments, whitespace-separated src dst
    per line, 0-based ids) → (src, dst) Dataset, parsed in parallel
    byte ranges (≙ hpparser)."""
    ranges = _byte_ranges(path, 0, target_chunk)
    if not ranges:
        return ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
        )
    ds = ray.data.from_items(ranges).map_batches(
        _ChunkParser(path, 0, pattern=True, comment=b"#",
                     one_based=False),
        batch_format="pyarrow",
        batch_size=1,
    )
    return ds
