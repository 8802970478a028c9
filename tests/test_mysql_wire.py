"""MySQL wire-compatibility slice (port-9004 surface): Handshake v10 →
HandshakeResponse41 → OK, COM_PING, COM_QUERY → text resultset with
ColumnDefinition41 typing, NULL cells, SET/USE acknowledgement, ERR
packets — both ends implementing the public wire grammar (the container
ships no mysql client)."""

import pytest

from clickhouseocp_spark.engine import ChSparkEngine
from clickhouseocp_spark.mysql_wire import (
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VAR_STRING,
    ChMySqlServer,
    MySqlWireClient,
    SERVER_VERSION,
)


@pytest.fixture(scope="module")
def mysql_server(spark, sf_dir):
    eng = ChSparkEngine(sf_dir, spark=spark)
    srv = ChMySqlServer(eng, port=0).start()
    yield srv
    srv.shutdown()


@pytest.fixture()
def client(mysql_server):
    c = MySqlWireClient("127.0.0.1", mysql_server.port)
    yield c
    c.close()


def test_handshake(client):
    assert client.connected
    assert client.server_version == SERVER_VERSION
    assert client.server_version.startswith("25.7")


def test_ping(client):
    assert client.ping()
    assert client.ping()


def test_query_text_resultset(client):
    names, types, rows = client.execute(
        "SELECT number AS n, toString(number) AS s, "
        "if(number % 2 = 0, toFloat64(number) / 2, NULL) AS h "
        "FROM numbers(5) ORDER BY n"
    )
    assert names == ["n", "s", "h"]
    # text protocol: every cell is a string; NULL is a typed None
    assert [r[0] for r in rows] == ["0", "1", "2", "3", "4"]
    assert [r[1] for r in rows] == ["0", "1", "2", "3", "4"]
    assert rows[1][2] is None and rows[2][2] == "1.0"
    assert types[0] == MYSQL_TYPE_LONGLONG
    assert types[1] == MYSQL_TYPE_VAR_STRING
    assert types[2] == MYSQL_TYPE_DOUBLE


def test_query_over_fixture_table(client):
    names, _types, rows = client.execute(
        "SELECT event_type, count() AS c FROM events "
        "GROUP BY event_type ORDER BY event_type"
    )
    assert names == ["event_type", "c"]
    assert [r[0] for r in rows] == [
        "click", "error", "purchase", "signup", "view",
    ]
    assert all(int(r[1]) > 0 for r in rows)


def test_connector_handshake_statements(client):
    # what real connectors fire on connect: SET + USE get a bare OK
    assert client.execute("SET NAMES utf8mb4") == ([], [], [])
    assert client.execute("USE default") == ([], [], [])
    # and the connection keeps serving queries afterwards
    _n, _t, rows = client.execute("SELECT 7 AS v")
    assert rows == [("7",)]


def test_err_packet_and_connection_survival(client):
    with pytest.raises(RuntimeError, match=r"^\[1105\]"):
        client.execute("SELECT definitely_not_a_function(1)")
    _n, _t, rows = client.execute("SELECT 1 AS ok")
    assert rows == [("1",)]


def test_sequential_queries_one_connection(client):
    for k in (1, 7, 3):
        _n, _t, rows = client.execute(f"SELECT {k} AS v")
        assert rows == [(str(k),)]
        assert client.ping()


def test_concurrent_connections(mysql_server):
    a = MySqlWireClient("127.0.0.1", mysql_server.port)
    b = MySqlWireClient("127.0.0.1", mysql_server.port)
    try:
        _n, _t, ra = a.execute("SELECT 10 AS v")
        _n, _t, rb = b.execute("SELECT 20 AS v")
        assert ra == [("10",)] and rb == [("20",)]
    finally:
        a.close()
        b.close()


def test_date_and_decimal_rendering(client):
    names, _types, rows = client.execute(
        "SELECT toDate('2024-03-05') AS d, "
        "toDateTime('2024-03-05 06:07:08') AS dt, "
        "CAST(1.25 AS Decimal(10, 2)) AS dec"
    )
    assert names == ["d", "dt", "dec"]
    assert rows[0][0] == "2024-03-05"
    assert rows[0][1] == "2024-03-05 06:07:08"
    assert rows[0][2] == "1.25"
