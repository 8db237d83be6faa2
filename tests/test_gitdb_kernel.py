"""Git-repository source + Jupyter kernel capability core.

Reference parity targets: ``connect("git://...")`` / GitInterface
(sql_interface.py:877-949, 1014) and ``preql/jup_kernel/kernel.py``
(do_execute html output, do_complete via autocomplete, last_word).
This very repository serves as the git fixture.
"""

import pytest
from pyspark.sql import functions as F

from preql_spark.engine import Engine

REPO = "/root/repo"


@pytest.fixture(scope="module")
def geng(spark):
    eng = Engine(spark)
    eng.import_git(REPO)
    return eng


def test_git_commits_table(geng):
    c = geng.t.commits.df
    assert set(c.columns) == {
        "hash", "author_name", "author_email", "author_when",
        "committer_name", "committer_email", "committer_when",
        "message", "parents"}
    n = c.count()
    assert n > 0
    # exactly one root commit, every other commit has >= 1 parent
    roots = c.filter(F.col("parents") == 0).count()
    assert roots == 1
    assert c.filter(F.col("parents") >= 1).count() == n - 1
    # timestamps parsed, not strings
    assert dict(c.dtypes)["author_when"] == "timestamp"


def test_git_refs_and_files(geng):
    refs = {(r.name, r.type) for r in geng.t.refs.df.collect()}
    assert ("refs/heads/main", "branch") in refs
    files = geng.t.commit_files.df
    assert {"hash", "file", "additions", "deletions"} == set(files.columns)
    touched = {r.file for r in files.select("file").distinct().collect()}
    assert "SURVEY.md" in touched or "__spark_entry__.py" in touched


def test_git_join_and_lang_query(geng):
    # history tables are full citizens: lang query + FK-style join
    out = geng.q('commits{author_name => n: count()} order {^n}')
    rows = out.collect()
    assert rows and rows[0].n >= 1
    j = (geng.t.commits.df.join(geng.t.commit_files.df, "hash")
         .groupBy("file").agg(F.count(F.lit(1)).alias("n")))
    assert j.count() > 0


def test_git_connect_uri(spark):
    from preql_spark import connect
    eng = connect(spark, data_dir=f"git://{REPO}")
    assert {"commits", "refs", "commit_files"} <= set(eng.tables())


def test_git_bad_repo_raises(spark):
    eng = Engine(spark)
    with pytest.raises(RuntimeError, match="git"):
        eng.import_git("/tmp/definitely_not_a_repo_xyz")


# ---- kernel capability core ------------------------------------------------

def test_kernel_last_word():
    from preql_spark.jup_kernel import last_word
    assert last_word("nation{n_na") == ("nation{", "n_na")
    assert last_word("") == ("", "")
    assert last_word("x + y") == ("x + ", "y")
    # the reference's `!` hack (kernel.py last_word): the `!` stays
    # with the context so `{... !co` completes the bare column name
    assert last_word("nation{... !n_n") == ("nation{... !", "n_n")


def test_kernel_execute_html(eng):
    from preql_spark.jup_kernel import execute_to_html
    out = execute_to_html(eng, "nation[n_nationkey < 3]")
    assert out["success"] and "<table" in out["output"]
    out2 = execute_to_html(eng, "1 + 2")
    assert out2["success"] and "3" in out2["output"]
    bad = execute_to_html(eng, "no_such_table{x}")
    assert not bad["success"] and "no_such_table" in bad["output"]


def test_kernel_complete(eng):
    from preql_spark.jup_kernel import complete_at
    code = "nati"
    out = complete_at(eng, code, len(code))
    assert out["status"] == "ok"
    assert "nation" in out["matches"]
    assert out["cursor_start"] == 0 and out["cursor_end"] == len(code)
    # column completion inside a projection
    code2 = "nation{n_na"
    out2 = complete_at(eng, code2, len(code2))
    assert any(m.startswith("n_na") for m in out2["matches"])


def test_kernel_class_gated_on_ipykernel():
    from preql_spark.jup_kernel import make_kernel_class
    try:
        import ipykernel  # noqa: F401
        has = True
    except ImportError:
        has = False
    if has:  # pragma: no cover - not in this container
        assert make_kernel_class() is not None
    else:
        with pytest.raises(ImportError, match="ipykernel"):
            make_kernel_class()


def test_kernelspec_install(tmp_path):
    import json

    from preql_spark.jup_kernel import install_kernelspec
    p = install_kernelspec(prefix=str(tmp_path))
    spec = json.load(open(p))
    assert spec["display_name"] == "preql_spark"
    assert "-m" in spec["argv"] and "preql_spark.jup_kernel" in spec["argv"]


def test_git_empty_repo_is_empty_database(spark, tmp_path):
    """A freshly git-init-ed repository imports as three EMPTY tables
    (git show-ref exits 1 and git log exits 128 there — both mean
    'no history yet', not failure)."""
    import subprocess
    repo = str(tmp_path / "fresh")
    subprocess.run(["git", "init", "-q", repo], check=True)
    eng = Engine(spark)
    got = eng.import_git(repo)
    assert set(got) == {"commits", "refs", "commit_files"}
    assert eng.t.commits.df.count() == 0
    assert eng.t.refs.df.count() == 0
    assert eng.t.commit_files.df.count() == 0
