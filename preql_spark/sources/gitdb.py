"""Git-repository source: query a repo's history as Spark tables.

Reference parity: ``connect("git://<path>")`` exposes a git repo as a
database (reference ``GitInterface``, sql_interface.py:877-949 — an
askgit subprocess wrapper).  This module re-derives the same
capability WITHOUT the external askgit binary: history is extracted
with plain ``git log`` / ``git show-ref`` (NUL-separated format
strings, so no quoting ambiguity) and materialized as DataFrames with
explicit schemas.

Tables (named after askgit's):

- ``commits``       one row per commit: hash, author/committer
                    name+email+timestamp, summary message, parent count
- ``refs``          one row per ref: name, type (branch/tag/remote), hash
- ``commit_files``  one row per (commit, file) with additions/deletions
                    (``--numstat``; NULL for binary files)

Scale shape: history extraction is a driver-side subprocess over ONE
repository — git metadata is MB-scale, not corpus-scale, so a
driver-side parse feeding ``createDataFrame`` is the right tool (the
same judgement the reference made by shelling out to askgit).  The
resulting DataFrames are ordinary Spark tables: joins against
corpus-scale data (e.g. blame-driven provenance joins) distribute
normally from there.  For a FLEET of repositories, run the extraction
per-repo and union the outputs — the per-repo step stays metadata-
sized either way.
"""

from __future__ import annotations

import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUL = "\x00"


def _git(repo: str, *args: str, empty_ok: bool = False) -> str:
    """Run git; ``empty_ok`` maps the "repository has no commits /
    no refs yet" outcomes to an empty listing instead of an error
    (``git show-ref`` exits 1 with no output on a ref-less repo, and
    ``git log`` exits 128 before the first commit) — a freshly
    ``git init``-ed repository is a valid, empty database."""
    import os
    try:
        # LC_ALL=C pins git's messages to English so the empty-repo
        # detection below is locale-stable
        return subprocess.check_output(
            ["git", "-C", repo, *args],
            stderr=subprocess.PIPE,
            env={**os.environ, "LC_ALL": "C"}).decode("utf-8", "replace")
    except FileNotFoundError as e:  # pragma: no cover - git always in CI
        raise RuntimeError(
            "Could not find executable 'git'. Make sure it's installed, "
            "and try again.") from e  # message mirrors the reference's
    except subprocess.CalledProcessError as e:
        err = e.stderr.decode("utf-8", "replace")
        if empty_ok and (
                (e.returncode == 1 and not e.output and not err.strip())
                or "does not have any commits yet" in err):
            return ""
        raise RuntimeError(
            f"git {' '.join(args)} failed in {repo!r}: "
            f"{err[:300]}") from e


_COMMITS_SCHEMA = T.StructType([
    T.StructField("hash", T.StringType()),
    T.StructField("author_name", T.StringType()),
    T.StructField("author_email", T.StringType()),
    T.StructField("author_when", T.StringType()),
    T.StructField("committer_name", T.StringType()),
    T.StructField("committer_email", T.StringType()),
    T.StructField("committer_when", T.StringType()),
    T.StructField("message", T.StringType()),
    T.StructField("parents", T.IntegerType()),
])


def commits_df(spark: SparkSession, repo: str) -> DataFrame:
    """askgit ``commits`` analogue (summary line as ``message``)."""
    # %x00 expands to NUL in git's output; a literal NUL can't ride
    # in an argv element (exec rejects embedded null bytes)
    fmt = "%x00".join(["%H", "%an", "%ae", "%aI", "%cn", "%ce", "%cI",
                       "%P", "%s"])
    out = _git(repo, "log", "--all", f"--format={fmt}", empty_ok=True)
    rows = []
    for line in out.splitlines():
        if not line.strip():
            continue
        parts = line.split(_NUL)
        if len(parts) < 9:
            continue
        (h, an, ae, aw, cn, ce, cw, par) = parts[:8]
        msg = _NUL.join(parts[8:])  # message may not contain NUL; safety
        rows.append((h, an, ae, aw, cn, ce, cw, msg,
                     len(par.split()) if par.strip() else 0))
    df = spark.createDataFrame(rows, schema=_COMMITS_SCHEMA)
    return (df.withColumn("author_when",
                          F.to_timestamp("author_when"))
            .withColumn("committer_when", F.to_timestamp("committer_when")))


_REFS_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("hash", T.StringType()),
])


def refs_df(spark: SparkSession, repo: str) -> DataFrame:
    """askgit ``refs`` analogue: branches, tags, remotes."""
    out = _git(repo, "show-ref", empty_ok=True)
    rows = []
    for line in out.splitlines():
        if not line.strip():
            continue
        h, _, name = line.partition(" ")
        if name.startswith("refs/heads/"):
            kind = "branch"
        elif name.startswith("refs/tags/"):
            kind = "tag"
        elif name.startswith("refs/remotes/"):
            kind = "remote"
        else:
            kind = "other"
        rows.append((name, kind, h))
    return spark.createDataFrame(rows, schema=_REFS_SCHEMA)


_FILES_SCHEMA = T.StructType([
    T.StructField("hash", T.StringType()),
    T.StructField("file", T.StringType()),
    T.StructField("additions", T.IntegerType()),
    T.StructField("deletions", T.IntegerType()),
])


def commit_files_df(spark: SparkSession, repo: str) -> DataFrame:
    """askgit ``stats`` analogue: per-(commit, file) line deltas.
    Binary files report NULL additions/deletions (git prints ``-``)."""
    out = _git(repo, "log", "--all", "--numstat", "--format=%x00%H",
               empty_ok=True)
    rows = []
    cur = None
    for line in out.splitlines():
        if line.startswith(_NUL):
            cur = line[1:].strip()
            continue
        if not line.strip() or cur is None:
            continue
        bits = line.split("\t")
        if len(bits) != 3:
            continue
        add, dele, path = bits
        rows.append((cur, path,
                     int(add) if add.isdigit() else None,
                     int(dele) if dele.isdigit() else None))
    return spark.createDataFrame(rows, schema=_FILES_SCHEMA)


def import_git(engine, repo: str, prefix: str = "") -> dict:
    """Register the git tables on an Engine's catalog and return them
    as {name: Table}.  ``prefix`` namespaces the table names when
    loading several repositories side by side."""
    tables = {
        f"{prefix}commits": commits_df(engine.spark, repo),
        f"{prefix}refs": refs_df(engine.spark, repo),
        f"{prefix}commit_files": commit_files_df(engine.spark, repo),
    }
    return {name: engine.register(name, df) for name, df in tables.items()}
