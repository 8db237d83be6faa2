"""Tutorial conformance — replays the reference's user-facing
tutorial (/root/reference/docs/tutorial.md) end to end against the
lang front-end.  This is the workflow a reference user would run on
day one; every assert mirrors an output shown in the doc (cited by
section).  Known divergences are asserted AS divergences where they
exist (none currently in this storyline)."""

import pytest

from preql_spark.table import Table


@pytest.fixture()
def tut(spark):
    from preql_spark.engine import Engine
    return Engine(spark)


def test_basic_expressions(tut):
    # tutorial "Basic Expressions"
    assert tut.q("1 + 1") == 2
    assert tut.q("2 / 4") == 0.5
    assert tut.q("27 % 13") == 1
    assert tut.q('"a" + "b"') == "ab"
    assert tut.q('"-" * 5') == "-----"
    assert tut.q("(not 0) and 2 < 4") is True
    assert tut.q("null == null") is True          # "Unlike SQL!"
    assert tut.q("10 /~ 3") == 3
    # type()
    assert tut.q("repr(type(10))") == "int"


def test_lists_and_ranges(tut):
    tut.q("my_list = [1,2,3]")
    assert tut.q("count(my_list + [4,5,6])") == 6
    # names(my_list) lists the single `item` column
    names = {r.name for r in tut.q("names(my_list)").collect()}
    assert names == {"item"}
    # range is stop-exclusive: [1..100] has 99 items
    assert tut.q("count([1..100])") == 99


def test_functions(tut):
    tut.q('''
func sign(x) {
    if (x == 0) {
        return 0
    } else if (x > 0) {
        return 1
    } else {
        return 0 - 1
    }
}
''')
    assert tut.q("sign(-100)") == -1
    assert tut.q("sign(100)") == 1
    # vectorized through a projection, auto-named by the function
    out = tut.q("[-20, 0, 30]{ sign(item) }")
    assert sorted(r.sign for r in out.collect()) == [-1, 0, 1]
    # one-liner form + strings
    tut.q("func str_concat(s1, s2) = s1 + s2")
    assert tut.q('str_concat("foo", "bar")') == "foobar"
    # functions are values: apply_function(length, item)
    tut.q("func apply_function(f, x) = f(x)")
    out = tut.q('["this", "is", "a", "list"]{ len: apply_function(length, item) }')
    assert sorted(r.len for r in out.collect()) == [1, 2, 4, 4]


def test_country_storyline(tut):
    # tutorial "Tables" — the full Country workflow
    tut.q('''
table Country {
    name: string
    population: int
}

palau = new Country("Palau", 17900)
nauru = new Country("Nauru", 11000)
new Country("Tuvalu", 10200)
''')
    assert tut.q("count(Country)") == 3
    # row vars + attribute arithmetic
    assert dict(tut.palau.asDict()) == {"id": 1, "name": "Palau",
                                        "population": 17900}
    assert tut.q("palau.population + 1") == 17901

    # selection: like + conjunction
    rows = tut.q('Country[name like "%l%", population < 15000]').collect()
    assert [r.name for r in rows] == ["Tuvalu"]
    # or + projection chain
    rows = tut.q('Country[name like "%l%" or population < 11000]'
                 ' {name, population}').collect()
    assert sorted(r.name for r in rows) == ["Palau", "Tuvalu"]
    # row-index slice [1..]
    assert tut.q("count(Country[1..])") == 2

    # projection with computed flag; ellipsis + user func auto-name
    rows = tut.q("Country{name, is_big: population > 15000}").collect()
    assert {r.name: bool(r.is_big) for r in rows} == {
        "Palau": True, "Nauru": False, "Tuvalu": False}
    tut.q("func half(n) = n / 2")
    out = tut.q("Country{..., half(population)}")
    assert out.columns == ["id", "name", "population", "half"]
    assert {r.name: r.half for r in out.collect()} == {
        "Palau": 8950.0, "Nauru": 5500.0, "Tuvalu": 5100.0}
    # persistent CTAS of the projection
    tut.q("table half_population = Country{..., half(population)}")
    assert tut.q("count(half_population)") == 3

    # aggregation: keys => values with auto names
    rows = tut.q("Country { length(name) => count(id) }").collect()
    assert {r.length: r["count"] for r in rows} == {5: 2, 6: 1}
    tut.q("world_population = Country { => sum(population) }")
    one = tut.q("one world_population")
    assert one["sum"] == 39100
    # even-odd histogram
    rows = tut.q("[1,2,3,4,5,6,7] { odd: item % 2 => count(item) }").collect()
    assert {r.odd: r["count"] for r in rows} == {0: 3, 1: 4}
    # sum of squares through a user aggregate
    tut.q("func sqrsum(x) = sum(x*x)")
    assert tut.q("one [1,2,3,4]{ => sqrsum(item)}")["sqrsum"] == 30

    # ordering
    assert [r.name for r in tut.q("Country order {population}").collect()] \
        == ["Tuvalu", "Nauru", "Palau"]
    assert [r.name for r in tut.q("Country order {^name}").collect()] \
        == ["Tuvalu", "Palau", "Nauru"]

    # temp table vs lazy query (both evaluate equal here)
    tut.q("table t_names = Country[population > 100]{name}")
    assert tut.q("count(t_names) + count(t_names)") == 6
    tut.q("q_names = Country[population > 100]{name}")
    assert tut.q("count(q_names) + count(q_names)") == 6

    # update: whole table, then a filtered revert
    tut.q("Country update {population: population + 1}")
    tut.q('Country[name == "Palau"] update {population: population - 1}')
    rows = {r.name: r.population for r in tut.q("Country").collect()}
    assert rows == {"Palau": 17900, "Nauru": 11001, "Tuvalu": 10201}

    # join-by-column over CTAS-from-list tables (auto id column)
    tut.q("table odds = [1, 3, 5, 7, 9, 11]")
    tut.q("table primes = [2, 3, 5, 7, 11]")
    j = tut.q("join(o: odds.item, p: primes.item)"
              " {o.item, o_id: o.id, p_id: p.id}")
    got = sorted((r.item, r.o_id, r.p_id) for r in j.collect())
    assert got == [(3, 2, 2), (5, 3, 3), (7, 4, 4), (11, 6, 5)]
    # filter by joining on name, destructured with {...c}
    rows = tut.q('join(c: Country.name, n:["Palau", "Nauru"].item) {...c}')
    assert sorted(r.name for r in rows.collect()) == ["Nauru", "Palau"]
    assert rows.columns == ["id", "name", "population"]
    # idiomatic in / !in
    assert sorted(r.name for r in
                  tut.q('Country[name in ["Palau", "Nauru"]]').collect()) \
        == ["Nauru", "Palau"]
    assert [r.name for r in
            tut.q('Country[name !in ["Palau", "Nauru"]]').collect()] \
        == ["Tuvalu"]

    # SQL escape hatch: scalar (vectorized) and table forms
    tut.q('func do_sql_stuff(x) = SQL(string, "lower($x) || \'!\'")')
    out = tut.q('["UP", "Up", "up"]{ do_sql_stuff(item) }')
    assert [r.do_sql_stuff for r in out.collect()] == ["up!"] * 3
    t = tut.engine_sql_country() if hasattr(tut, "engine_sql_country") \
        else tut.sql('SELECT * FROM $Country WHERE name == "Palau"')
    assert isinstance(t, Table)
    assert [r.name for r in t.collect()] == ["Palau"]
