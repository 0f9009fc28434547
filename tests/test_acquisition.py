"""Acquisition layer (S8): fetch strategies, ledger triage, per-file retry.

Covers the reference's loader semantics (sources/loader.py run/triage/
check_new_files/fetch_one, sources/fetch/http.py retry) with a real local
HTTP server, including the flaky-then-succeed retry path.
"""

import http.server
import json
import os
import shutil
import threading

import pytest

from georiva_spark.sources.acquisition import (
    FileRequest,
    HTTPFetchStrategy,
    LocalFSStrategy,
    Loader,
)


def _requests_from_dir(src_dir):
    def gen(_collection):
        for name in sorted(os.listdir(src_dir)):
            yield FileRequest(
                identifier=name,
                filename=name,
                params={"path": os.path.join(src_dir, name)},
            )

    return gen


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "remote"
    d.mkdir()
    for i in range(4):
        (d / f"grid_{i}.npz").write_bytes(b"payload-%d" % i * 10)
    return str(d)


def _loader(spark, tmp_path, src_dir, strategy=None):
    return Loader(
        spark,
        collection="era5",
        data_source=_requests_from_dir(src_dir),
        fetch_strategy=strategy or LocalFSStrategy(),
        landing_dir=str(tmp_path / "landing"),
        ledger_dir=str(tmp_path / "ledger"),
    )


def test_run_fetches_and_records_ledger(spark, tmp_path, src_dir):
    loader = _loader(spark, tmp_path, src_dir)
    result = loader.run()
    assert result.files_fetched == 4
    assert result.files_failed == 0
    assert result.files_skipped == 0
    # files landed
    landed = os.listdir(os.path.join(str(tmp_path / "landing"), "era5"))
    assert sorted(landed) == [f"grid_{i}.npz" for i in range(4)]
    # ledger rows
    ff = loader.fetched_files().collect()
    assert len(ff) == 4
    assert all(r.status == "complete" for r in ff)
    assert all(r.request_payload for r in ff)
    # event-sourced run log: 'running' row lands first, terminal row after
    events = sorted(loader.fetch_runs().collect(),
                    key=lambda r: (r.finished_at is not None))
    assert [e.status for e in events] == ["running", "completed"]
    runs = loader.runs_latest().collect()
    assert len(runs) == 1
    assert runs[0].files_fetched == 4
    assert runs[0].status == "completed"


def test_triage_skips_existing_second_run(spark, tmp_path, src_dir):
    loader = _loader(spark, tmp_path, src_dir)
    loader.run()
    # add one new remote file; second run must fetch ONLY it
    with open(os.path.join(src_dir, "grid_9.npz"), "wb") as f:
        f.write(b"new")
    second = loader.run()
    assert second.files_fetched == 1
    assert second.files_skipped == 4
    # skip_existing=False refetches everything
    third = loader.run(skip_existing=False)
    assert third.files_fetched == 5


def test_check_new_files_dry_run_persists_nothing(spark, tmp_path, src_dir):
    loader = _loader(spark, tmp_path, src_dir)
    cands = loader.check_new_files()
    assert [c.exists for c in cands] == [False] * 4
    assert loader.fetched_files().count() == 0
    assert loader.fetch_runs().count() == 0
    loader.run(max_files=2)
    cands = loader.check_new_files()
    assert sum(c.exists for c in cands) == 2


def test_failed_fetch_isolated_and_recorded(spark, tmp_path, src_dir):
    os.remove(os.path.join(src_dir, "grid_2.npz"))

    def gen(_c):
        for i in range(4):  # grid_2 now missing → one failure
            yield FileRequest(
                identifier=f"grid_{i}.npz",
                filename=f"grid_{i}.npz",
                params={"path": os.path.join(src_dir, f"grid_{i}.npz")},
            )

    loader = Loader(
        spark,
        collection="era5",
        data_source=gen,
        fetch_strategy=LocalFSStrategy(),
        landing_dir=str(tmp_path / "landing"),
        ledger_dir=str(tmp_path / "ledger"),
    )
    result = loader.run()
    assert result.files_fetched == 3
    assert result.files_failed == 1
    assert "grid_2.npz" in result.errors[0]
    statuses = {r.filename: r.status for r in loader.fetched_files().collect()}
    assert statuses["grid_2.npz"] == "failed"
    # failed file is NOT treated as existing → retried on the next run
    rerun = loader.run()
    assert rerun.files_skipped == 3
    assert rerun.files_failed == 1


def test_refetch_from_persisted_payload(spark, tmp_path, src_dir):
    loader = _loader(spark, tmp_path, src_dir)
    loader.run()
    row = loader.fetched_files().where("filename = 'grid_1.npz'").first()
    dest = os.path.join(str(tmp_path / "landing"), "era5", "grid_1.npz")
    os.remove(dest)
    fr = loader.refetch(row.request_payload)
    assert fr.success
    assert os.path.exists(dest)


def test_retry_file_in_place_recomputes_run(spark, tmp_path, src_dir):
    """acquisition_retry.py semantics: the stored request is rebuilt, the
    SAME storage_path walks the state machine again, and the parent run's
    counters are recomputed from its children."""
    victim = os.path.join(src_dir, "grid_2.npz")
    payload = open(victim, "rb").read()
    os.remove(victim)
    loader = _loader(spark, tmp_path, src_dir)

    def gen(_c):
        for i in range(4):
            yield FileRequest(
                identifier=f"grid_{i}.npz", filename=f"grid_{i}.npz",
                params={"path": os.path.join(src_dir, f"grid_{i}.npz")})

    loader.data_source = gen
    loader.run()
    run = loader.runs_latest().collect()[0]
    assert run.status == "completed_with_errors"
    assert run.files_failed == 1
    # remote file comes back → retry succeeds in place
    with open(victim, "wb") as f:
        f.write(payload)
    fr = loader.retry_file("era5/grid_2.npz")
    assert fr.success
    latest = {r.storage_path: r.status for r in loader.files_latest().collect()}
    assert latest["era5/grid_2.npz"] == "complete"
    run2 = loader.runs_latest().collect()[0]
    assert run2.run_id == run.run_id
    assert run2.status == "completed" and run2.files_failed == 0
    assert run2.files_fetched == 4
    # retry without a ledger record refuses
    from georiva_spark.sources.acquisition import RetryNotPossible
    with pytest.raises(RetryNotPossible):
        loader.retry_file("era5/never_seen.npz")


def test_recover_stale_runs_sweep_and_capped_resume(spark, tmp_path, src_dir):
    """acquisition_recovery.py semantics: a run stranded in 'running' is
    declared dead on age, marked interrupted with truthful counters, and
    auto-resumed — capped via resumed_from lineage."""
    from datetime import datetime, timedelta

    from georiva_spark.sources.acquisition import FETCH_RUN_SCHEMA

    loader = _loader(spark, tmp_path, src_dir)
    # simulate a hard death: 'running' event only, no terminal row
    started = datetime.utcnow() - timedelta(hours=7)
    loader._append(
        [("era5-DEADRUN", "era5", None, "running",
          0, 0, 0, 0, started, None, None)],
        FETCH_RUN_SCHEMA, "fetch_runs")
    out = loader.recover_stale_runs(stale_after_seconds=6 * 3600)
    assert out == {"swept": 1, "resumed": 1}
    latest = {r.run_id: r for r in loader.runs_latest().collect()}
    assert latest["era5-DEADRUN"].status == "interrupted"
    # the resume fetched everything (fresh run, skip_existing dedupe)
    resumes = [r for r in latest.values()
               if r.resumed_from == "era5-DEADRUN"]
    assert len(resumes) == 1 and resumes[0].status == "completed"
    # fresh runs (young 'running' rows) are NOT swept
    assert loader.recover_stale_runs(stale_after_seconds=6 * 3600) == \
        {"swept": 0, "resumed": 0}
    # cap: a chain of max_auto_resumes resumes parks instead of looping
    l2 = _loader(spark, tmp_path / "x", src_dir)
    (tmp_path / "x").mkdir(exist_ok=True)
    t0 = datetime.utcnow() - timedelta(hours=20)
    rows = [("r0", "era5", None, "running", 0, 0, 0, 0, t0, None, None),
            ("r1", "era5", "r0", "running", 0, 0, 0, 0,
             t0 + timedelta(hours=1), None, None),
            ("r2", "era5", "r1", "running", 0, 0, 0, 0,
             t0 + timedelta(hours=2), None, None)]
    l2._append(rows, FETCH_RUN_SCHEMA, "fetch_runs")
    out = l2.recover_stale_runs(stale_after_seconds=3600)
    # r0 (depth 0) and r1 (depth 1) may resume; r2 is the 2nd resume → parked
    assert out["swept"] == 3
    assert out["resumed"] == 2


def test_request_payload_roundtrip():
    from datetime import datetime

    req = FileRequest(
        identifier="a",
        filename="a.grib2",
        valid_time=datetime(2026, 1, 2, 6),
        reference_time=datetime(2026, 1, 2, 0),
        params={"url": "http://x/a.grib2"},
        expected_format="grib",
        variables=["t2m"],
    )
    back = FileRequest.from_dict(json.loads(json.dumps(req.to_dict())))
    assert back == req
    assert back.is_forecast and back.forecast_hour == 6


class _FlakyHandler(http.server.BaseHTTPRequestHandler):
    """503 twice per path, then serve — exercises retry/backoff."""

    fail_counts = {}
    body = b"grib2-bytes-" * 64

    def do_GET(self):
        n = self.fail_counts.get(self.path, 0)
        if n < 2:
            self.fail_counts[self.path] = n + 1
            self.send_response(503)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.body)))
        self.end_headers()
        self.wfile.write(self.body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def http_server():
    _FlakyHandler.fail_counts = {}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_strategy_retries_on_503(http_server, tmp_path):
    strat = HTTPFetchStrategy({"max_retries": 3, "backoff_factor": 0.01})
    req = FileRequest(
        identifier="f", filename="f.grib2", params={"url": f"{http_server}/f.grib2"}
    )
    fr = strat.fetch(req, str(tmp_path / "f.grib2"))
    assert fr.success
    assert fr.bytes_transferred == len(_FlakyHandler.body)
    assert _FlakyHandler.fail_counts["/f.grib2"] == 2  # retried through 2 failures


def test_http_strategy_gives_up_past_max_retries(http_server, tmp_path):
    strat = HTTPFetchStrategy({"max_retries": 1, "backoff_factor": 0.01})
    req = FileRequest(
        identifier="g", filename="g.grib2", params={"url": f"{http_server}/g.grib2"}
    )
    fr = strat.fetch(req, str(tmp_path / "g.grib2"))
    assert fr.failed
    assert "503" in fr.error


def test_http_loader_end_to_end(spark, http_server, tmp_path):
    def gen(_c):
        for i in range(3):
            yield FileRequest(
                identifier=f"h{i}",
                filename=f"h{i}.grib2",
                params={"url": f"{http_server}/h{i}.grib2"},
            )

    loader = Loader(
        spark,
        collection="nomads",
        data_source=gen,
        fetch_strategy=HTTPFetchStrategy({"max_retries": 3, "backoff_factor": 0.01}),
        landing_dir=str(tmp_path / "landing"),
        ledger_dir=str(tmp_path / "ledger"),
    )
    result = loader.run()
    assert result.files_fetched == 3
    assert loader.run().files_skipped == 3


def test_sftp_strategy_stubbed_fetch(tmp_path):
    """The SFTP transport plugs into the same strategy/ledger contract:
    with a stub connection wired in place of paramiko's SFTPClient, a
    fetch downloads the remote path, fills bytes/duration/status, and a
    missing path fails without raising — byte-for-byte the FTP/HTTP
    result shape."""
    from georiva_spark.sources.acquisition import (FileRequest,
                                                   FTPFetchStrategy)

    remote = tmp_path / "remote.grib2"
    remote.write_bytes(b"GRIB-payload" * 10)

    class _StubSFTP:
        def get(self, path, local):
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            shutil.copyfile(path, local)

        def close(self):
            pass

    s = FTPFetchStrategy({"protocol": "sftp", "host": "example.org"})
    assert s.protocol == "sftp" and s.label == "FTP/SFTP/FTPS"
    s._sftp = _StubSFTP()                     # transport stub
    req = FileRequest(identifier="c", filename="remote.grib2",
                      params={"path": str(remote)})
    dst = str(tmp_path / "local" / "remote.grib2")
    r = s.fetch(req, dst)
    assert r.success and r.status == "complete"
    assert r.bytes_transferred == len(b"GRIB-payload") * 10
    assert open(dst, "rb").read() == remote.read_bytes()

    bad = s.fetch(FileRequest(identifier="c", filename="nope",
                              params={"path": str(tmp_path / "nope")}),
                  str(tmp_path / "local" / "nope"))
    assert bad.failed and bad.status == "failed"
    s.disconnect()                            # stub close() path


def test_sftp_gate_names_paramiko_when_absent(monkeypatch):
    """No paramiko in this container → connect raises a NAMED gate (the
    strategy itself constructs fine; ftp/ftps are unaffected)."""
    from georiva_spark.sources.acquisition import FTPFetchStrategy
    try:
        import paramiko  # noqa: F401
        pytest.skip("paramiko present — gate not reachable")
    except ImportError:
        pass
    s = FTPFetchStrategy({"protocol": "sftp", "host": "h"})
    with pytest.raises(NotImplementedError, match="paramiko"):
        s.connect()


def test_ftp_protocol_validation_and_defaults():
    from georiva_spark.sources.acquisition import FTPFetchStrategy
    assert FTPFetchStrategy({}).protocol == "ftp"
    assert FTPFetchStrategy({"protocol": "FTPS"}).protocol == "ftps"
    with pytest.raises(ValueError, match="gopher"):
        FTPFetchStrategy({"protocol": "gopher"})
