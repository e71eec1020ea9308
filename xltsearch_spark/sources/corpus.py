"""Deterministic synthetic source-code corpus (FIXTURES.md §1, §3).

Generates the input table mandated by BASELINE.json's input_hint —
``(repo, path, commit, lang, content)`` plus a nullable ``title`` metadata
column (standing in for the Tika-extracted ``title`` field the reference
indexes, ``Config.java:146`` / ``IndexTask.java:74-78``) — with the
controlled term patterns the golden tests probe: a 90%-df hot term, unique
per-doc needles, graded term frequencies with varied doc lengths, phrase /
slop / stop-gap pairs, and analyzer probe strings.

Rows are generated directly in ``(repo, path)`` lexicographic order so the
global generation index == the engine's deterministic dense ``doc_id``
(FIXTURES.md: doc ids assigned in (repo, path) sort order, which reproduces
Lucene's docID-ascending tie-break at ``SearchTask.java:63``).

Everything is seeded; no wall-clock, no ambient randomness.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SCALES = {"tiny": 64, "small": 2000, "bench": 100_000}

_EXTS = [("py", "python"), ("java", "java"), ("scala", "scala"), ("go", "go"),
         ("js", "js"), ("md", "md"), ("txt", "txt")]

_CODE_WORDS = ("def class return import public static void func package let const "
               "string int float buffer index shard segment query token stream "
               "merge flush commit reader writer search score filter parse "
               "partition executor driver shuffle broadcast").split()

_PROSE_WORDS = ("the quick brown fox jumps over a lazy dog and then it runs to "
                "there with these results that will be of no such use for their "
                "work because documents are indexed into an inverted list").split()

_PROBES = ("Author's I.B.M. http://example.com/q?x=1 dev@example.com "
           "CamelCaseIdentifier snake_case_name running quickly")

N_REPOS = 7


def generate_corpus(n_docs: int = 2000, seed: int = 42, version: int = 1) -> pd.DataFrame:
    """Build the corpus as pandas (small scales; parquet-written for Spark).

    ``version=2`` emits the update scenario of FIXTURES.md §3: ~5% of rows
    modified (content change -> new sha256), ~5% deleted, ~5% appended —
    used by the incremental-update (MERGE) tests.
    """
    rng = np.random.default_rng([seed, 1])
    rows = []
    per_repo = [n_docs // N_REPOS + (1 if r < n_docs % N_REPOS else 0) for r in range(N_REPOS)]
    i = 0  # global (repo, path)-sorted index == expected doc_id
    for r in range(N_REPOS):
        for j in range(per_repo[r]):
            ext, lang = _EXTS[(r + j) % len(_EXTS)]
            repo = f"repo{r}"
            path = f"src/pkg{j // 100:03d}/mod_{j % 100:02d}_{j:05d}.{ext}"
            content = _make_content(i, rng)
            commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
            title = f"Module {i}" if i % 2 == 0 else None
            rows.append((repo, path, commit, lang, content, title))
            i += 1
    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content", "title"])
    if version == 2:
        df = _mutate_v2(df, seed)
    return df


def _make_content(i: int, rng: np.random.Generator) -> str:
    parts: list[str] = []
    # filler: deterministic code-ish + prose words, length varies by doc
    doc_rng = np.random.default_rng([777, i])
    n_fill = int(10 + (i % 23) * 4 + doc_rng.integers(0, 8))
    fill = doc_rng.choice(np.array(_CODE_WORDS + _PROSE_WORDS, dtype=object), size=n_fill)
    parts.extend(fill.tolist())
    # hot term in 90% of docs (skew / WAND probe)
    if i % 10 != 0:
        parts.append("common_token")
    # unique needle per doc (exact-hit probe)
    parts.append(f"needle_{i}")
    # graded tf with varied doc length (BM25 saturation / length-norm probe)
    if i % 4 == 0:
        tf = 2 ** ((i // 4) % 5)  # 1,2,4,8,16
        parts.extend(["graded"] * tf)
    # phrase patterns
    m = i % 7
    if m == 1:
        parts.extend(["alpha", "beta"])
    elif m == 2:
        parts.extend(["alpha", "gap", "beta"])
    elif m == 3:
        parts.extend(["alpha", "the", "beta"])  # stop-word position gap
    elif m == 4:
        parts.extend(["beta", "alpha"])
    # analyzer probes in a sprinkle of docs
    if i % 13 == 0:
        parts.append(_PROBES)
    if i % 97 == 0:
        parts.append("x" * 300)  # >255-char token (maxTokenLength probe)
    return " ".join(parts)


def _mutate_v2(df: pd.DataFrame, seed: int) -> pd.DataFrame:
    """v2 corpus: 5% modified, 5% deleted, 5% added (FIXTURES.md §3)."""
    n = len(df)
    rng = np.random.default_rng([seed, 2])
    idx = rng.permutation(n)
    n_mod, n_del = max(1, n // 20), max(1, n // 20)
    mod_idx, del_idx = idx[:n_mod], idx[n_mod:n_mod + n_del]
    df = df.copy()
    df.loc[df.index[mod_idx], "content"] = df.loc[df.index[mod_idx], "content"] + " modified_marker_v2"
    df = df.drop(df.index[del_idx])
    added = []
    for k in range(max(1, n // 20)):
        repo = f"repo{k % N_REPOS}"
        path = f"src/pkgnew/added_{k:05d}.py"
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        added.append((repo, path, commit, "python",
                      f"added document {k} fresh_needle_{k} common_token", f"Added {k}"))
    df = pd.concat([df, pd.DataFrame(added, columns=df.columns)], ignore_index=True)
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def corpus_manifest(df: pd.DataFrame) -> pd.DataFrame:
    """(repo, path, hashsum) manifest for the per-row sha256 invariant."""
    h = df["content"].map(lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest())
    return pd.DataFrame({"repo": df["repo"], "path": df["path"], "hashsum": h})


def write_corpus_parquet(df: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def read_corpus(spark, path: str, fmt: str | None = None,
                column_map: dict[str, str] | None = None):
    """Load a corpus table from parquet / JSON-lines / CSV into the engine's
    canonical schema (repo, path, commit, lang, content, title[, meta]).

    * ``fmt`` None infers from the file extension (.parquet/.json/.jsonl/
      .csv); directories default to parquet.
    * ``column_map`` renames source columns onto the canonical names
      (e.g. {"repository": "repo", "body": "content"}).
    * Missing optional columns (commit, lang, title) are added as NULL
      strings; repo/path/content are required and raise if absent.

    Scale note: all three readers are Spark's native distributed sources —
    schema projection happens at the scan (parquet) or parse (json/csv);
    nothing funnels through the driver.
    """
    from pyspark.sql import functions as F
    low = path.lower()
    if fmt is None:
        if low.endswith(".csv"):
            fmt = "csv"
        elif low.endswith(".json") or low.endswith(".jsonl"):
            fmt = "json"
        else:
            fmt = "parquet"
    if fmt == "csv":
        # multiLine: content fields (code bodies!) contain newlines — without
        # it Spark splits quoted fields mid-row into silent garbage rows
        df = (spark.read.option("header", "true").option("escape", '"')
              .option("multiLine", "true").csv(path))
    elif fmt in ("json", "jsonl"):
        df = spark.read.json(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    for src, dst in (column_map or {}).items():
        df = df.withColumnRenamed(src, dst)
    missing = [c for c in ("repo", "path", "content") if c not in df.columns]
    if missing:
        raise ValueError(f"corpus at {path} lacks required columns: {missing}")
    for c in ("commit", "lang", "title"):
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    keep = ["repo", "path", "commit", "lang", "content", "title"]
    if "meta" in df.columns:
        keep.append("meta")
    return df.select(*[F.col(c).cast("string") if c != "meta" else F.col(c)
                       for c in keep])
