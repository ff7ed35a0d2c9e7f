"""Arrow Flight server tests (reference roadmap ``README.md:334`` —
"Arrow Flight server", an UNCHECKED ecosystem row).

Every test speaks the real wire protocol over a live localhost grpc
socket: get_flight_info → do_get round trips, catalog listing, the ddl
action (including ``STORED AS ZARR``), and the error surface."""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("pyarrow.flight")


@pytest.fixture(scope="module")
def flight_server(spark):
    from zarr_datafusion_spark.engine import Engine
    from zarr_datafusion_spark.flight import start_server

    e = Engine(spark)
    e.register_parquet_dir("/root/testdata/sf0.001")
    server, _t = start_server(e)
    yield e, server
    server.shutdown()


def test_flight_sql_roundtrip(flight_server):
    from zarr_datafusion_spark.flight import flight_sql

    e, server = flight_server
    sql = (
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    got = flight_sql(server.location, sql)
    want = e.sql(sql).toArrow()
    assert got.equals(want)
    assert got.num_rows == 3


def test_flight_info_schema_without_execution(flight_server):
    import pyarrow as pa
    import pyarrow.flight as fl

    _e, server = flight_server
    client = fl.connect(server.location)
    try:
        info = client.get_flight_info(
            fl.FlightDescriptor.for_command(
                b"SELECT o_orderkey, o_totalprice FROM orders"
            )
        )
        names = [f.name for f in info.schema]
        assert names == ["o_orderkey", "o_totalprice"]
        assert pa.types.is_integer(info.schema.field("o_orderkey").type)
    finally:
        client.close()


def test_flight_list_flights_catalog(flight_server):
    import pyarrow.flight as fl

    _e, server = flight_server
    client = fl.connect(server.location)
    try:
        cmds = {
            f.descriptor.command.decode() for f in client.list_flights()
        }
        assert "SELECT * FROM lineitem" in cmds
        assert "SELECT * FROM region" in cmds
    finally:
        client.close()


def test_flight_ddl_action_registers_zarr(flight_server, tmp_path):
    import pyarrow.flight as fl

    from zarr_datafusion_spark.flight import flight_sql
    from zarr_datafusion_spark.zarr.writer import write_store

    _e, server = flight_server
    store = str(tmp_path / "fl.zarr")
    write_store(
        store,
        {
            "t": (np.arange(4, dtype=np.int64), (4,)),
            "x": (np.arange(3, dtype=np.int64), (3,)),
            "v": (np.arange(12, dtype=np.int64).reshape(4, 3), (2, 3)),
        },
    )
    client = fl.connect(server.location)
    try:
        res = list(
            client.do_action(
                fl.Action(
                    "ddl",
                    f"CREATE EXTERNAL TABLE fl_zarr STORED AS ZARR "
                    f"LOCATION '{store}'".encode(),
                )
            )
        )
        assert res and res[0].body.to_pybytes() == b"OK"
    finally:
        client.close()
    got = flight_sql(
        server.location, "SELECT SUM(v) AS s, COUNT(*) AS n FROM fl_zarr"
    )
    assert got.column("s")[0].as_py() == 66 and got.column("n")[0].as_py() == 12


def test_flight_error_surfaces(flight_server):
    import pyarrow.flight as fl

    _e, server = flight_server
    client = fl.connect(server.location)
    try:
        with pytest.raises(fl.FlightServerError, match="planning failed"):
            client.get_flight_info(
                fl.FlightDescriptor.for_command(b"SELECT * FROM no_such_tbl")
            )
        with pytest.raises(fl.FlightServerError, match="unknown action"):
            list(client.do_action(fl.Action("nope", b"")))
        with pytest.raises(fl.FlightServerError, match="SQL command"):
            client.get_flight_info(fl.FlightDescriptor.for_path("x"))
    finally:
        client.close()


def test_advertised_location_follows_bind_host(engine):
    """Endpoints must advertise the host the server was asked to serve
    on — a hardcoded loopback sends remote clients to themselves (r11
    review finding).  Wildcard binds fall back to loopback."""
    pytest.importorskip("pyarrow.flight")
    from zarr_datafusion_spark.flight import EngineFlightServer

    srv = EngineFlightServer(engine, "grpc://localhost:0")
    try:
        assert srv.location.startswith("grpc://localhost:")
    finally:
        srv.shutdown()
    srv = EngineFlightServer(engine, "grpc://0.0.0.0:0")
    try:
        assert srv.location.startswith("grpc://127.0.0.1:")
    finally:
        srv.shutdown()
