"""Deterministic synthetic source-code corpus (the north-rule input table).

Schema (exact, per BASELINE.json input_hint):
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Every row is a pure function of ``(global_index, n_repos, files_per_repo,
seed)`` — no wall-clock, no driver-side loops: the corpus is produced by
``ray.data.range(n_files).map_batches(...)`` so synthesis itself scales with
the cluster, and the *expected* import-edge table is computed by the same
pure function, making edge extraction exactly testable (FIXTURES.md F1).

Structure mirrors what makes real code corpora hard for link analytics:

- per-repo, per-lang "utility" file imported by most same-lang files
  (power-law in-degree → skew exercise, SURVEY §7 "hard parts");
- ~10% isolated files with zero imports and zero importers (dangling /
  isolated vertices → PageRank dangling handling,
  reference simple_pagerank.hpp:294-300, and Pregel CC indegree==0 halt,
  pregel_connected_components.hpp:90-91);
- three languages with distinct, regex-extractable import syntaxes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

LANGS = ("py", "js", "c")
_EXT = {"py": "py", "js": "js", "c": "c"}
_FILLER_WORDS = (
    "def process(x): return x + %d",
    "// handler branch %d",
    "let acc_%d = 0;",
    "static int counter_%d;",
    "# note: pass %d keeps the scanner honest",
    "while (tick < %d) { tick++; }",
)


def corpus_num_files(n_repos: int, files_per_repo: int) -> int:
    return n_repos * files_per_repo


def _commit_of(repo: str, seed: int) -> str:
    return hashlib.sha256(f"{repo}:{seed}".encode()).hexdigest()[:40]


def _rng_for(seed: int, repo_idx: int, file_idx: int) -> np.random.RandomState:
    h = hashlib.sha256(f"{seed}:{repo_idx}:{file_idx}".encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "little"))


def _file_meta(gidx: int, n_repos: int, files_per_repo: int):
    """(repo_idx, file_idx, repo, path, lang, is_isolated, is_utility)."""
    repo_idx, file_idx = divmod(gidx, files_per_repo)
    repo = f"org{repo_idx % 7}/repo{repo_idx}"
    lang = LANGS[file_idx % len(LANGS)]
    # Last ~10% of each repo's files are isolated (no imports, no importers).
    iso_start = files_per_repo - max(1, files_per_repo // 10)
    is_isolated = file_idx >= iso_start
    is_utility = file_idx == (file_idx % len(LANGS))  # first file of its lang
    path = f"src/pkg_{file_idx % 5}/mod_{file_idx}.{_EXT[lang]}"
    return repo_idx, file_idx, repo, path, lang, is_isolated, is_utility


def _path_of(file_idx: int) -> str:
    lang = LANGS[file_idx % len(LANGS)]
    return f"src/pkg_{file_idx % 5}/mod_{file_idx}.{_EXT[lang]}"


def _import_targets(
    gidx: int,
    n_repos: int,
    files_per_repo: int,
    seed: int,
    import_factor: int = 1,
) -> list[int]:
    """Deterministic same-repo, same-lang import targets (file indices)."""
    repo_idx, file_idx, _, _, lang, is_isolated, is_utility = _file_meta(
        gidx, n_repos, files_per_repo
    )
    if is_isolated:
        return []
    lang_id = file_idx % len(LANGS)
    iso_start = files_per_repo - max(1, files_per_repo // 10)
    # Same-lang, non-isolated candidates in this repo.
    candidates = [
        f for f in range(lang_id, iso_start, len(LANGS)) if f != file_idx
    ]
    if not candidates:
        return []
    utility = lang_id  # first file of this lang group
    rng = _rng_for(seed, repo_idx, file_idx)
    targets: list[int] = []
    if not is_utility and rng.rand() < 0.8:
        targets.append(utility)
    # Zipf-ish out-degree: k in [0, 4], skewed toward small;
    # import_factor scales density for benchmark corpora.
    k = (int(min(rng.zipf(2.0), 5)) - 1) * import_factor
    pool = [c for c in candidates if c not in targets]
    if k > 0 and pool:
        picks = rng.choice(len(pool), size=min(k, len(pool)), replace=False)
        targets.extend(pool[int(i)] for i in sorted(picks))
    return targets


def _import_line(lang: str, dst_path: str) -> str:
    if lang == "py":
        mod = dst_path[: -len(".py")].replace("/", ".")
        return f"import {mod}"
    if lang == "js":
        return f"const dep = require('./{dst_path}');"
    return f'#include "{dst_path}"'


def _make_rows(
    gidxs: np.ndarray,
    n_repos: int,
    files_per_repo: int,
    seed: int,
    import_factor: int = 1,
) -> dict[str, list]:
    repos, paths, commits, langs, contents = [], [], [], [], []
    for gidx in gidxs:
        gidx = int(gidx)
        repo_idx, file_idx, repo, path, lang, _, _ = _file_meta(
            gidx, n_repos, files_per_repo
        )
        rng = _rng_for(seed, repo_idx, file_idx + 10_000_019)
        lines = [f"// {repo}:{path}" if lang != "py" else f"# {repo}:{path}"]
        for t in _import_targets(
            gidx, n_repos, files_per_repo, seed, import_factor
        ):
            lines.append(_import_line(lang, _path_of(t)))
        n_filler = 3 + int(rng.randint(0, 12))
        for i in range(n_filler):
            tmpl = _FILLER_WORDS[int(rng.randint(0, len(_FILLER_WORDS)))]
            lines.append(tmpl % int(rng.randint(0, 10_000)))
        repos.append(repo)
        paths.append(path)
        commits.append(_commit_of(repo, seed))
        langs.append(lang)
        contents.append("\n".join(lines) + "\n")
    return {
        "repo": repos,
        "path": paths,
        "commit": commits,
        "lang": langs,
        "content": contents,
    }


def synth_corpus(
    n_repos: int = 10,
    files_per_repo: int = 60,
    seed: int = 42,
    *,
    import_factor: int = 1,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Corpus as a Dataset; each block synthesized on-worker from indices.
    ``import_factor`` scales import density (bench corpora)."""
    n = corpus_num_files(n_repos, files_per_repo)

    def gen(batch: dict[str, np.ndarray]) -> pa.Table:
        return pa.table(
            _make_rows(
                batch["id"], n_repos, files_per_repo, seed, import_factor
            )
        )

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="numpy")


def corpus_table(
    n_repos: int,
    files_per_repo: int,
    seed: int = 42,
    import_factor: int = 1,
) -> pa.Table:
    """The same corpus as ``synth_corpus`` but built driver-side as one
    Arrow table (no Ray) — row-identical to the Dataset (both are the
    same pure function of the global index). Used to hand the DuckDB
    oracle twins a parquet copy of exactly what the Ray queries see."""
    n = corpus_num_files(n_repos, files_per_repo)
    return pa.table(
        _make_rows(
            np.arange(n, dtype=np.int64),
            n_repos,
            files_per_repo,
            seed,
            import_factor,
        )
    )


def expected_edges(
    n_repos: int, files_per_repo: int, seed: int = 42,
    import_factor: int = 1,
) -> pa.Table:
    """Ground-truth import edges ``(repo, src_path, dst_path)`` (driver-side;
    used by tests to check extraction exactly — FIXTURES.md F1)."""
    repos, srcs, dsts = [], [], []
    for gidx in range(corpus_num_files(n_repos, files_per_repo)):
        _, _, repo, path, _, _, _ = _file_meta(gidx, n_repos, files_per_repo)
        for t in _import_targets(
            gidx, n_repos, files_per_repo, seed, import_factor
        ):
            repos.append(repo)
            srcs.append(path)
            dsts.append(_path_of(t))
    return pa.table({"repo": repos, "src_path": srcs, "dst_path": dsts})
