"""Multi-process (simulated multi-host / DCN) execution tests.

Boots N real OS processes with ``jax.distributed`` + gloo CPU collectives
over loopback — the process-boundary analogue of the reference's
``DistributedQueryRunner`` (``testing/trino-testing/.../
DistributedQueryRunner.java:72``, which boots N servers in one JVM) — and
diffs rank-0 results against the in-process local oracle."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(nproc: int, local_devices: int, queries: str, out_path,
                 sql=(), timeout=900):
    """Spawn nproc worker processes; return rank-0's results dict."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = []
    for pid in range(nproc):
        cmd = [sys.executable, WORKER, "--pid", str(pid),
               "--nproc", str(nproc), "--port", str(port),
               "--local-devices", str(local_devices),
               "--queries", queries, "--sf", "0.01"]
        for s in sql:
            cmd += ["--sql", s]
        if pid == 0:
            cmd += ["--out", str(out_path)]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), \
        "\n".join(o[-3000:] for o in outs)
    with open(out_path) as f:
        return json.load(f)


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, bool):
                vals.append(int(v))
            elif isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


def _oracle_rows(sql):
    from presto_tpu.exec.runner import LocalRunner
    r = _oracle_rows._runner
    if r is None:
        r = _oracle_rows._runner = LocalRunner(scale_factor=0.01)
    out = r.run_sql(sql)
    return list(zip(*[out.to_pydict()[n] for n in out.names])) \
        if out.names and out.row_count else []


_oracle_rows._runner = None


@pytest.mark.parametrize("nproc,local_devices", [(2, 2)])
def test_multiprocess_bitexact(tmp_path, nproc, local_devices):
    """TPC-H subset across 2 processes × 2 devices == local single-device
    results (covers scan sharding, FIXED_HASH exchange across the process
    boundary, partial→final agg, expanding join, dist sort)."""
    from presto_tpu.tpch.queries import QUERIES
    qids = [1, 3, 6, 13]
    data = _run_cluster(nproc, local_devices, ",".join(map(str, qids)),
                        tmp_path / "r.json")
    assert data["n_devices"] == nproc * local_devices
    for rec in data["results"]:
        qid = int(rec["query"][1:])
        exp = _oracle_rows(QUERIES[qid])
        assert rec["rows"] == len(exp), rec["query"]
        assert _norm(rec["data"]) == _norm(exp), rec["query"]


def test_multiprocess_general_sql(tmp_path):
    """Non-TPC-H shapes across the process boundary: expanding join with
    materialized output, cross join, UNION."""
    stmts = [
        "select o_orderpriority, count(*) c from orders o, customer c "
        "where o.o_custkey = c.c_custkey and c.c_nationkey < 5 "
        "group by o_orderpriority",
        "select count(*) from nation, region",
        "select n_regionkey from nation union "
        "select r_regionkey from region",
    ]
    data = _run_cluster(2, 2, "", tmp_path / "r.json", sql=stmts)
    for rec, sql in zip(data["results"], stmts):
        exp = _oracle_rows(sql)
        assert _norm(rec["data"]) == _norm(exp), sql
