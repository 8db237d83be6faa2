"""Ported reference autocomplete tests
(/root/reference/tests/test_autocomplete.py) against
preql_spark.autocomplete — same positional harness: ``<<<name>>>``
marks a position where ``name`` must be among the suggestions for the
code cut at that point.

The reference's UnknownInstance propagation (a join over *unknown*
tables still suggests its alias columns) is covered by syntactic
kwarg-name recovery: a join-family RHS that cannot be evaluated binds
a pseudo table whose columns are the kwarg names.
"""

import re

import pytest

from preql_spark.autocomplete import autocomplete


def _parse_requirements(s: str):
    """Strip ``<<<name>>>`` markers, returning (clean_source,
    {cut_position: required_name}) — reference harness
    test_autocomplete.py:193-204."""
    matches = {}
    offset = 0

    def g(m):
        nonlocal offset
        start = m.start() + offset
        (x,) = m.groups()
        matches[start] = x
        offset -= 6
        return x

    new_s = re.sub(r"<<<(\w+)>>>", g, s)
    for k, v in matches.items():
        assert new_s[k:k + len(v)] == v, (k, v)
    return new_s, matches


def progressive_test(eng, s: str, test_partial: bool = False):
    """Reference harness test_autocomplete.py:206-216: assert each
    marker; with test_partial also exercise every prefix (no-crash)."""
    s, d = _parse_requirements(s)
    for i in range(1, len(s)):
        if i in d or test_partial:
            names = autocomplete(eng, s[:i])
            if i in d:
                assert d[i] in names, (i, s[:i], d[i])


@pytest.fixture()
def ac_eng(spark):
    from preql_spark.engine import Engine
    return Engine(spark)


def test_basic(ac_eng):
    # reference test_basic (test_autocomplete.py:14-41)
    assert "item" in autocomplete(ac_eng, "func d(){ [1]{")
    assert "item" in autocomplete(ac_eng, "func d(){ [1][")
    assert "item" not in autocomplete(ac_eng, "func d(){ [1]")

    res = autocomplete(ac_eng, """
    func x(param1) {
        hello = "b"
    """)
    assert "hello" in res, res.keys()

    # unterminated string → no suggestions, no crash
    autocomplete(ac_eng, """
    func x(param1) {
        hello = "b
    """)

    res = autocomplete(ac_eng, """
    func x(param1) {
        hello = [1] {item, item+2}
    """)
    assert "hello" in res, res.keys()

    res = autocomplete(ac_eng, """a = [1,2,3]{.""")
    assert res == {}

    res = autocomplete(ac_eng, """table a""")
    assert res and all(isinstance(v, tuple) for v in res.values())


def test_progressive1(ac_eng):
    s0 = """
    func hello() = 0

    a = <<<hello>>>
    """
    progressive_test(ac_eng, s0)
    progressive_test(ac_eng, s0, True)


def test_progressive2(ac_eng):
    # reference test_progressive2 (test_autocomplete.py:56-75): the
    # join-alias columns (u, l) must suggest even though logins/User
    # are unresolvable — kwarg-name recovery stands in for the
    # reference's UnknownInstance propagation
    s1 = """
    func get_users(logins) {
        const table matched_logins = <<<leftjoin>>>(l:logins.item, u:User.login)

        existing_users = <<<matched_logins>>>[<<<u>>>!=null] {<<<u>>>.id}
        new_users = new[] User(login: <<<matched_logins>>>[<<<u>>>==null] {<<<l>>>.item})

        return <<<existing_users>>> + <<<new_users>>>
    }

    hello = <<<get_users>>>([1,2,3])
    do_whatever = <<<hello>>>
    """
    progressive_test(ac_eng, s1 * 2)
    progressive_test(ac_eng, s1, True)


def test_progressive3(ac_eng):
    s = """
    try {
        SQL(<<<int>>>, "SELECT 2; SELECT 1;")
    }
    catch(e: Exception) {
        <<<print>>> <<<e>>>
    }
    """
    progressive_test(ac_eng, s, True)


def test_params(ac_eng):
    s = """
    func enum2(tbl, whatever) = <<<tbl>>> + <<<whatever>>>
    a = <<<enum2>>>
    """
    progressive_test(ac_eng, s)


def test_expr(ac_eng):
    s = """
    table x {
        a: int
        two: int
        three: int
    }
    <<<x>>>{<<<three>>>}
    <<<x>>>{ => min(<<<two>>>), max(<<<three>>>)}
    """
    progressive_test(ac_eng, s)


def test_exclude_columns(ac_eng):
    s = """
    table x {
        a: int
        two: int
        three: int
    }
    a = <<<x>>>{... !<<<a>>> !<<<two>>>}{<<<three>>>}
    """
    progressive_test(ac_eng, s)


def test_assert(ac_eng):
    s = """
    hello = 10
    assert <<<hello>>>
    """
    progressive_test(ac_eng, s)


def test_attr(ac_eng):
    s = """
    table Country {name: string}
    a = join(c: Country.<<<name>>>, n:["Palau", "Nauru"].<<<item>>>) {n.<<<item>>> => c.<<<name>>>}
    """
    progressive_test(ac_eng, s)


def test_attr_id_column(ac_eng):
    # table defs get the implicit id pk, like the reference's auto-id
    res = autocomplete(ac_eng, "table Country {name: string}\nCountry.")
    assert "id" in res and "name" in res


def test_range(ac_eng):
    s = """
    x=[1,2,3,3,10]
    x order {<<<item>>>} [(<<<count>>>(<<<x>>>/~2))..]
    """
    progressive_test(ac_eng, s)


def test_statements(ac_eng):
    s = """
    for (i in [1, 2]) {
        <<<print>>> <<<i>>>
    }
    """
    progressive_test(ac_eng, s)

    s = """
    while (true) {
        <<<print>>> 1
    }
    """
    progressive_test(ac_eng, s)


def test_catalog_columns(eng):
    # engine-catalog tables suggest their parquet schema columns
    res = autocomplete(eng, "nation{")
    assert "n_name" in res and "n_regionkey" in res
    res = autocomplete(eng, "customer[")
    assert "c_acctbal" in res
    res = autocomplete(eng, "nation.")
    assert "n_nationkey" in res


def test_ranks(ac_eng):
    res = autocomplete(ac_eng, "")
    assert res["table"][0] == 100000       # keyword
    assert res["count"][0] == 10000        # builtin
    res = autocomplete(ac_eng, "zz = 1\n")
    assert res["zz"][0] == 1000            # local


def test_completer_word_filter(eng):
    from preql_spark.autocomplete import make_completer
    comp = make_completer(eng, [])
    # drain the completion stream; other tests sharing the
    # session-scoped engine may have registered bindings with the
    # same prefix (e.g. test_core's nations_lo temptable), so assert
    # set membership and prefix discipline, not an exact singleton
    got = []
    i = 0
    while True:
        c = comp("nat", i)
        if c is None:
            break
        got.append(c)
        i += 1
    assert "nation" in got
    assert all(c.startswith("nat") for c in got)
    assert comp("nat", len(got)) is None
