"""Client API: DB-API 2.0-style connections + cursors.

The single-process analogue of the reference's client stack
(``client/trino-client`` StatementClientV1 + ``client/trino-jdbc``): a
Connection binds a Session (schema + property overrides); Cursors execute
SQL and iterate row tuples.  Query state moves through the same lifecycle
states as the reference's FSM (``execution/QueryState.java``).
"""

from __future__ import annotations

import enum
import itertools
import time
from dataclasses import dataclass, field
from typing import Any, Iterator, List, Optional, Sequence, Tuple

from ..exec.runner import LocalRunner
from ..utils.config import EngineConfig, Session
from ..utils.events import (EventListenerManager, QueryCompletedEvent,
                            QueryCreatedEvent)


class QueryState(enum.Enum):
    QUEUED = "QUEUED"
    PLANNING = "PLANNING"
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"
    FAILED = "FAILED"


_query_ids = itertools.count(1)


@dataclass
class QueryInfo:
    query_id: str
    sql: str
    state: QueryState = QueryState.QUEUED
    error: Optional[str] = None
    elapsed_s: float = 0.0
    rows: int = 0


class Cursor:
    def __init__(self, conn: "Connection"):
        self.conn = conn
        self.description: Optional[List[Tuple]] = None
        self.rowcount = -1
        self._rows: List[Tuple] = []
        self._pos = 0
        self.last_query: Optional[QueryInfo] = None

    def execute(self, sql: str, params: Sequence[Any] = ()) -> "Cursor":
        if params:
            # simple positional '?' substitution (values are SQL-escaped)
            for p in params:
                lit = f"'{p}'" if isinstance(p, str) else repr(p)
                sql = sql.replace("?", lit, 1)
        info = QueryInfo(f"q_{next(_query_ids)}", sql)
        self.last_query = info
        self.conn._queries.append(info)
        self.conn.events.query_created(QueryCreatedEvent(
            info.query_id, sql, self.conn.session.user))
        t0 = time.time()
        try:
            info.state = QueryState.PLANNING
            table = self.conn._runner.run_sql(sql)
            info.state = QueryState.FINISHED
        except Exception as e:  # noqa: BLE001 - surface engine errors
            info.state = QueryState.FAILED
            info.error = f"{type(e).__name__}: {e}"
            raise
        finally:
            info.elapsed_s = time.time() - t0
            self.conn.events.query_completed(QueryCompletedEvent(
                info.query_id, sql, self.conn.session.user,
                info.state.value, info.elapsed_s, info.rows, info.error))
        data = table.to_pydict()
        names = list(data.keys())
        # planning/execution warnings (reference: WarningCollector on the
        # query; surfaced in QueryResults.warnings)
        self.warnings = self.conn._runner.last_warnings.as_dicts()
        self.description = [(n, str(table.columns[n].dtype),
                             None, None, None, None, None)
                            for n in names]
        self._rows = list(zip(*[data[n] for n in names])) if names else []
        self._pos = 0
        self.rowcount = len(self._rows)
        info.rows = self.rowcount
        return self

    def fetchone(self) -> Optional[Tuple]:
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchmany(self, size: int = 1000) -> List[Tuple]:
        out = self._rows[self._pos:self._pos + size]
        self._pos += len(out)
        return out

    def fetchall(self) -> List[Tuple]:
        out = self._rows[self._pos:]
        self._pos = len(self._rows)
        return out

    def __iter__(self) -> Iterator[Tuple]:
        while True:
            r = self.fetchone()
            if r is None:
                return
            yield r

    def close(self):
        self._rows = []


class Connection:
    def __init__(self, schema: str = "tiny",
                 scale_factor: Optional[float] = None,
                 session: Optional[Session] = None,
                 config: Optional[EngineConfig] = None):
        self.session = session or Session(schema=schema)
        self.config = config or EngineConfig()
        if self.config.pallas_kernels:
            from ..ops import pallas_kernels as PK
            PK.configure("on")
        self._runner = LocalRunner(schema=self.session.schema,
                                   scale_factor=scale_factor)
        self._queries: List[QueryInfo] = []
        self.events = EventListenerManager()
        self._txn = None
        self._tm = None
        self._pre_txn_tables = None

    def cursor(self) -> Cursor:
        return Cursor(self)

    def execute(self, sql: str) -> Cursor:
        return self.cursor().execute(sql)

    # -- explicit transactions (reference: InMemoryTransactionManager;
    # autocommit per statement unless begun).  Reads inside an open
    # transaction observe the memory-catalog snapshot pinned at begin();
    # writes buffer in the transaction and publish atomically at commit.
    def begin(self):
        from ..utils.transactions import TransactionManager
        assert self._txn is None, "transaction already open"
        if self._tm is None:
            self._tm = TransactionManager(self._runner.datasource)
        self._txn = self._tm.begin()
        ds = self._runner.datasource
        self._pre_txn_tables = ds.memory
        mem = ds.catalog.get("memory").metadata
        mem.tables = dict(self._txn.tables())
        ds.memory = mem.tables
        ds._bump()
        return self._txn

    def commit(self):
        assert self._txn is not None, "no open transaction"
        txn, self._txn = self._txn, None
        ds = self._runner.datasource
        # session-buffered DDL became the connection's memory dict; diff
        # it against the snapshot into the transaction's write set
        for name, t in ds.memory.items():
            if self._pre_txn_tables.get(name) is not t:
                txn.create_table(name, t)
        for name in set(self._pre_txn_tables) - set(ds.memory):
            txn.drop_table(name)
        self._restore(ds)
        txn.commit()
        self._tm.finish(txn.id)

    def rollback(self):
        assert self._txn is not None, "no open transaction"
        txn, self._txn = self._txn, None
        self._restore(self._runner.datasource)
        txn.rollback()
        self._tm.finish(txn.id)

    def _restore(self, ds):
        mem = ds.catalog.get("memory").metadata
        mem.tables = self._pre_txn_tables
        ds.memory = mem.tables
        ds._bump()

    def queries(self) -> List[QueryInfo]:
        """Query history (the ``/v1/query`` QueryResource analogue)."""
        return list(self._queries)

    def close(self):
        pass


def connect(schema: str = "tiny", scale_factor: Optional[float] = None,
            **kw) -> Connection:
    return Connection(schema=schema, scale_factor=scale_factor, **kw)
