"""JDBC sources — the live-database migration path for the
reference's server-engine dialects.

Reference parity: ``connect()`` speaks nine engines
(``/root/reference/preql/core/sql.py:11-19``; URI dispatch in
``sql_interface.py:965-1025`` — postgres, mysql, bigquery, snowflake,
redshift, presto, oracle beside the embedded sqlite/duck).  The
Spark-native replacement for the reference's single DB-API connection
is ``spark.read.jdbc``:

- **Partitioned reads**: with ``partition_col`` the scan becomes
  ``num_partitions`` parallel range queries — a big operational table
  lands as a distributed scan, not a driver funnel.  Bounds are
  auto-probed with one ``SELECT min, max`` round-trip when not given.
- **Pushdown**: Catalyst pushes filters and column pruning into the
  generated SQL, so ``t[x > 3]{a, b}`` reads only what it needs from
  the remote engine.
- Driver jars are the deployment's responsibility (``--jars`` /
  ``spark.jars.packages``) — this module only maps URI schemes to
  JDBC URLs and driver class names.

BigQuery is the one reference dialect with no plain-JDBC mapping
here: its Spark path is the dedicated ``spark-bigquery-connector``
(``spark.read.format("bigquery")``), pointed to by the error message.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

#: reference dialect -> (jdbc url prefix, driver class, catalog query)
#: catalog query reflects the user-visible tables of the CURRENT
#: schema/database, mirroring the reference's connect-time reflection
_DIALECTS: dict[str, tuple[str, str, str]] = {
    "postgres": ("jdbc:postgresql://", "org.postgresql.Driver",
                 "SELECT table_name FROM information_schema.tables "
                 "WHERE table_schema = current_schema()"),
    "postgresql": ("jdbc:postgresql://", "org.postgresql.Driver",
                   "SELECT table_name FROM information_schema.tables "
                   "WHERE table_schema = current_schema()"),
    "mysql": ("jdbc:mysql://", "com.mysql.cj.jdbc.Driver",
              "SELECT table_name FROM information_schema.tables "
              "WHERE table_schema = database()"),
    "redshift": ("jdbc:redshift://",
                 "com.amazon.redshift.jdbc42.Driver",
                 "SELECT table_name FROM information_schema.tables "
                 "WHERE table_schema = current_schema()"),
    "snowflake": ("jdbc:snowflake://",
                  "net.snowflake.client.jdbc.SnowflakeDriver",
                  "SELECT table_name FROM information_schema.tables "
                  "WHERE table_schema = current_schema()"),
    "presto": ("jdbc:presto://", "com.facebook.presto.jdbc.PrestoDriver",
               "SELECT table_name FROM information_schema.tables "
               "WHERE table_schema = current_schema"),
    "trino": ("jdbc:trino://", "io.trino.jdbc.TrinoDriver",
              "SELECT table_name FROM information_schema.tables "
              "WHERE table_schema = current_schema"),
    "oracle": ("jdbc:oracle:thin:@//", "oracle.jdbc.OracleDriver",
               "SELECT table_name FROM user_tables"),
    "mssql": ("jdbc:sqlserver://",
              "com.microsoft.sqlserver.jdbc.SQLServerDriver",
              "SELECT table_name FROM information_schema.tables "
              "WHERE table_schema = schema_name()"),
}


#: identifier quote characters per dialect (open, close); everything
#: ANSI-quotes with double quotes except mysql (backticks) and mssql
#: (brackets — safe regardless of QUOTED_IDENTIFIER)
_QUOTES: dict[str, tuple[str, str]] = {
    "mysql": ("`", "`"),
    "mssql": ("[", "]"),
}

_SIMPLE_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_$#]*$")


def quote_ident(scheme: str, name: str) -> str:
    """Dialect-quote ``name`` for interpolation into generated SQL
    (the min/max partition probe and the dbtable option).

    Simple identifiers pass through UNQUOTED so the engine's own case
    folding keeps working (Oracle upper-folds unquoted names — a user
    typing ``lineitem`` must still hit ``LINEITEM``).  Anything else —
    mixed punctuation, spaces, reserved-word punctuation, or a name
    reflected from a hostile catalog — is quoted with the dialect's
    quote character, embedded quote characters doubled, so it can
    never terminate the identifier and inject SQL into the probe.
    Dotted ``schema.table`` names are quoted part-by-part."""
    op, cl = _QUOTES.get(scheme, ('"', '"'))
    parts = []
    for part in name.split("."):
        if _SIMPLE_IDENT.match(part):
            parts.append(part)
        else:
            parts.append(op + part.replace(cl, cl + cl) + cl)
    return ".".join(parts)


def parse_jdbc_uri(uri: str) -> tuple[str, dict]:
    """``postgres://user:pw@host:5432/db`` →
    (``jdbc:postgresql://host:5432/db``, {user, password, driver}).

    Credentials move into connection PROPERTIES (never onto the URL,
    where they would leak into plans and logs)."""
    u = urlparse(uri)
    scheme = u.scheme.lower()
    if scheme == "bigquery":
        raise ValueError(
            "bigquery has no plain-JDBC path — use the "
            "spark-bigquery-connector "
            "(spark.read.format('bigquery').option('table', ...))")
    if scheme not in _DIALECTS:
        raise ValueError(
            f"unknown JDBC dialect {scheme!r}; known: "
            f"{sorted(_DIALECTS)}")
    prefix, driver, _catalog = _DIALECTS[scheme]
    host = u.hostname or "localhost"
    netloc = f"{host}:{u.port}" if u.port else host
    path = u.path or ""
    # the query string carries engine options (sslmode=require,
    # currentSchema=..., serverTimezone=...) — forward it onto the
    # JDBC URL verbatim rather than silently dropping it
    query = f"?{u.query}" if u.query else ""
    props = {"driver": driver}
    if u.username:
        props["user"] = unquote(u.username)
    if u.password:
        props["password"] = unquote(u.password)
    return f"{prefix}{netloc}{path}{query}", props


def jdbc_table_df(spark: SparkSession, uri: str, table: str,
                  partition_col: str | None = None,
                  num_partitions: int = 8,
                  lower: int | None = None, upper: int | None = None,
                  fetch_size: int = 10_000,
                  properties: dict | None = None,
                  _reader=None) -> DataFrame:
    """One remote table as a DataFrame.

    With ``partition_col`` (a roughly-uniform numeric/date column —
    typically the primary key) the read issues ``num_partitions``
    parallel range queries; ``lower``/``upper`` bounds are auto-probed
    with a one-row min/max query when omitted.  Without it the read
    is a single remote cursor — fine for dimensions, wrong for facts.

    ``_reader`` injects a reader factory for tests (no live database
    in CI); production always uses ``spark.read``."""
    url, props = parse_jdbc_uri(uri)
    props = {**props, **(properties or {})}
    scheme = urlparse(uri).scheme.lower()
    # names reflected from a remote catalog (or typed by a user) go
    # into generated SQL — dialect-quote anything non-simple so mixed
    # case / spaces / reserved words work and nothing can inject
    q_table = quote_ident(scheme, table)
    q_part = (quote_ident(scheme, partition_col)
              if partition_col is not None else None)

    def reader():
        r = (_reader() if _reader is not None else spark.read) \
            .format("jdbc").option("url", url) \
            .option("fetchsize", str(fetch_size))
        for k, v in props.items():
            r = r.option(k, v)
        return r

    if partition_col is not None and (lower is None or upper is None):
        probe = (reader()
                 .option("query",
                         f"SELECT MIN({q_part}) AS lo, "
                         f"MAX({q_part}) AS hi FROM {q_table}")
                 .load().collect()[0])
        # positional access: some engines (Oracle) fold unquoted
        # aliases to upper case, so probe["lo"] would not resolve
        lower = probe[0] if lower is None else lower
        upper = probe[1] if upper is None else upper
        if lower is None or upper is None:       # empty table
            partition_col = None
    r = reader().option("dbtable", q_table)
    if partition_col is not None:
        r = (r.option("partitionColumn", q_part)
             .option("lowerBound", str(lower))
             .option("upperBound", str(upper))
             .option("numPartitions", str(num_partitions)))
    return r.load()


def import_jdbc(engine, uri: str, tables: list[str] | None = None,
                partition_cols: dict[str, str] | None = None,
                num_partitions: int = 8, prefix: str = "",
                properties: dict | None = None, _reader=None) -> dict:
    """Register every (or the listed) remote table on the Engine —
    the reference's connect-time reflection (sql_interface.py:965)
    over ``spark.read.jdbc``.

    ``tables=None`` reflects the current schema via the dialect's
    catalog query.  ``partition_cols`` maps table name → partition
    column for the tables that deserve a parallel scan."""
    url, props = parse_jdbc_uri(uri)
    props = {**props, **(properties or {})}
    if tables is None:
        scheme = urlparse(uri).scheme.lower()
        catalog = _DIALECTS[scheme][2]
        r = (_reader() if _reader is not None else engine.spark.read) \
            .format("jdbc").option("url", url).option("query", catalog)
        for k, v in props.items():
            r = r.option(k, v)
        tables = [row[0] for row in r.load().collect()]
    out = {}
    for t in tables:
        df = jdbc_table_df(engine.spark, uri, t,
                           partition_col=(partition_cols or {}).get(t),
                           num_partitions=num_partitions,
                           properties=properties, _reader=_reader)
        out[prefix + t] = engine.register(prefix + t, df)
    return out
