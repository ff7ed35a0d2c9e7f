"""Arrow Flight server over the SQL engine (reference roadmap
``README.md:334`` — "Arrow Flight server", an UNCHECKED ecosystem row
the reference never built).

Standard Flight SQL-style handshake: a client asks
``get_flight_info(FlightDescriptor.for_command(sql))`` for the result
schema + an endpoint ticket, then streams the result with
``do_get(ticket)`` as Arrow record batches — the wire protocol BI
tools and cross-language clients (Rust/Go/Java Arrow) already speak.
DDL travels through ``do_action("ddl", stmt)`` (CREATE/DROP, including
the engine's ``STORED AS ZARR`` form), and ``list_flights`` enumerates
the registered tables with their schemas.

Scale posture — this is the CONTROL-PLANE door, stated honestly: a
Flight result streams through the DRIVER (``DataFrame.toArrow`` is a
collect), so it serves interactive/BI-sized results; bulk data
movement stays on the executor-parallel sinks (parquet out via
``\\format parquet``, Zarr out via ``COPY ... STORED AS ZARR``), where
every task writes its own partition.  The server itself is
threaded (grpc) and shares one engine; queries serialize on Spark's
own scheduler like any multi-client session.

Gated behind an import-try: ``pyarrow.flight`` ships in standard
pyarrow wheels, but a build without it gets a clear error instead of
an ImportError at module import.
"""

from __future__ import annotations

__all__ = ["EngineFlightServer", "flight_sql", "start_server"]


def _flight():
    try:
        import pyarrow.flight as fl
    except ImportError as e:  # pragma: no cover - present in this env
        raise NotImplementedError(
            "the Arrow Flight surface requires pyarrow built with "
            "flight support (pyarrow.flight)"
        ) from e
    return fl


def _spark_schema_to_arrow(df) -> "object":
    """Result schema WITHOUT executing the query: convert Spark's
    analyzed schema (free) instead of running ``toArrow`` twice."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


class EngineFlightServer:
    """Flight endpoint for one :class:`zarr_datafusion_spark.engine.
    Engine`.  Construct with ``location="grpc://127.0.0.1:0"`` to bind
    an ephemeral port; the bound address is ``server.location``."""

    def __new__(cls, engine, location: str = "grpc://127.0.0.1:0"):
        fl = _flight()

        class _Server(fl.FlightServerBase):
            def __init__(self, engine_, loc):
                super().__init__(loc)
                self.engine = engine_
                # advertise the HOST the server was asked to serve on,
                # not a hardcoded loopback: a client following
                # get_flight_info -> do_get(endpoint.locations[0])
                # must reach THIS machine (r11 review finding).  A
                # wildcard bind has no single advertisable address;
                # fall back to loopback (the caller can still connect
                # by whatever name resolves here).
                host = "127.0.0.1"
                rest = loc.split("://", 1)[-1]
                bind_host = rest.rsplit(":", 1)[0] if rest else ""
                if bind_host not in ("", "0.0.0.0", "[::]", "::"):
                    host = bind_host
                self.location = f"grpc://{host}:{self.port}"

            # -- query path ------------------------------------------------
            def get_flight_info(self, context, descriptor):
                sql = (descriptor.command or b"").decode("utf-8")
                if not sql:
                    raise fl.FlightServerError(
                        "descriptor must carry a SQL command "
                        "(FlightDescriptor.for_command)"
                    )
                try:
                    df = self.engine.sql(sql)
                    schema = _spark_schema_to_arrow(df)
                except Exception as e:
                    raise fl.FlightServerError(f"planning failed: {e}")
                endpoint = fl.FlightEndpoint(
                    sql.encode("utf-8"), [self.location]
                )
                return fl.FlightInfo(schema, descriptor, [endpoint], -1, -1)

            def do_get(self, context, ticket):
                sql = ticket.ticket.decode("utf-8")
                try:
                    table = self.engine.sql(sql).toArrow()
                except Exception as e:
                    raise fl.FlightServerError(f"query failed: {e}")
                return fl.RecordBatchStream(table)

            # -- catalog ----------------------------------------------------
            def list_flights(self, context, criteria):
                for t in self.engine.spark.catalog.listTables():
                    sql = f"SELECT * FROM {t.name}"
                    try:
                        schema = _spark_schema_to_arrow(
                            self.engine.spark.table(t.name)
                        )
                    except Exception:
                        continue
                    desc = fl.FlightDescriptor.for_command(
                        sql.encode("utf-8")
                    )
                    endpoint = fl.FlightEndpoint(
                        sql.encode("utf-8"), [self.location]
                    )
                    yield fl.FlightInfo(schema, desc, [endpoint], -1, -1)

            # -- DDL --------------------------------------------------------
            def do_action(self, context, action):
                if action.type == "ddl":
                    stmt = action.body.to_pybytes().decode("utf-8")
                    try:
                        self.engine.sql(stmt)
                    except Exception as e:
                        raise fl.FlightServerError(f"ddl failed: {e}")
                    yield fl.Result(b"OK")
                    return
                raise fl.FlightServerError(
                    f"unknown action {action.type!r} (supported: ddl)"
                )

            def list_actions(self, context):
                return [("ddl", "execute a DDL statement (CREATE/DROP ...)")]

        return _Server(engine, location)


def start_server(engine, location: str = "grpc://127.0.0.1:0"):
    """Bind and return the server plus a daemon thread serving it."""
    import threading

    server = EngineFlightServer(engine, location)
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return server, t


def flight_sql(location: str, sql: str):
    """Client convenience: run ``sql`` against a server and return the
    result as a pyarrow Table (get_flight_info → do_get)."""
    fl = _flight()
    client = fl.connect(location)
    try:
        info = client.get_flight_info(
            fl.FlightDescriptor.for_command(sql.encode("utf-8"))
        )
        ticket = info.endpoints[0].ticket
        return client.do_get(ticket).read_all()
    finally:
        client.close()
