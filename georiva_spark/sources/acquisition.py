"""File acquisition layer: fetch strategies + loader with ledger triage.

Reproduces the reference's source-acquisition semantics (S8) Spark-first:

- ``FileRequest`` / ``FetchResult`` dataclasses mirror
  ``sources/fetch/base.py:11-90`` (identity, temporal context, JSON-safe
  ``to_dict``/``from_dict`` round-trip so a single file can be re-fetched
  later from its persisted payload).
- ``BaseFetchStrategy`` contract (``sources/fetch/base.py:92-142``):
  connect/disconnect lifecycle, ``fetch(request, local_path)``, context
  manager. Strategies here are stdlib-only: local filesystem, HTTP(S) via
  ``urllib.request`` with bounded exponential-backoff retries on
  {429,500,502,503,504} (the reference's ``Retry(status_forcelist=...)``,
  ``sources/fetch/http.py:73-79``), and FTP via ``ftplib``
  (``sources/fetch/ftp.py``).
- ``Loader`` mirrors ``sources/loader.py``: generate requests from a data
  source, **triage** candidates against the fetched-files ledger
  (skip-if-exists), fetch with per-file error isolation, and record
  ``fetch_runs`` / ``fetched_files`` ledger rows.

Scale-first divergence from the reference: triage is a DataFrame
**left-semi join** of the ledger against the broadcast candidate list
rather than a per-file ``bucket.exists()`` probe
(``sources/loader.py:420-425``) — one shuffle-free broadcast join
classifies millions of candidates in a single ledger scan, where the
reference pays one storage round-trip per file. The ledger is plain
parquet append (fetch outcomes are immutable events, so no upsert needed).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.error
import urllib.request
from dataclasses import asdict, dataclass, field
from datetime import datetime, timedelta
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RETRYABLE_HTTP = {429, 500, 502, 503, 504}


class RetryNotPossible(Exception):
    """This file record cannot be re-fetched (acquisition_retry.py:18)."""


@dataclass
class FileRequest:
    """What we WANT to fetch — may not exist yet (fetch/base.py:11-28)."""

    identifier: str
    filename: str
    valid_time: Optional[datetime] = None
    reference_time: Optional[datetime] = None
    params: dict = field(default_factory=dict)
    expected_size: Optional[int] = None
    expected_format: Optional[str] = None
    variables: list = field(default_factory=list)

    def to_dict(self) -> dict:
        payload = asdict(self)
        for key in ("valid_time", "reference_time"):
            if payload[key] is not None:
                payload[key] = payload[key].isoformat()
        return payload

    @classmethod
    def from_dict(cls, payload: dict) -> "FileRequest":
        data = dict(payload)
        for key in ("valid_time", "reference_time"):
            if data.get(key) is not None:
                data[key] = datetime.fromisoformat(data[key])
        return cls(**data)

    @property
    def is_forecast(self) -> bool:
        return self.reference_time is not None

    @property
    def forecast_hour(self) -> Optional[int]:
        if self.reference_time and self.valid_time:
            return int((self.valid_time - self.reference_time).total_seconds() // 3600)
        return None


@dataclass
class FetchResult:
    request: FileRequest
    local_path: Optional[str] = None
    success: bool = False
    error: Optional[str] = None
    bytes_transferred: int = 0
    duration_seconds: float = 0.0
    status: str = "pending"

    @property
    def failed(self) -> bool:
        return not self.success


class BaseFetchStrategy:
    """HOW to retrieve data, not WHAT (fetch/base.py:92-142)."""

    type: str = ""
    label: str = ""

    def __init__(self, config: Optional[dict] = None):
        if not self.type or not self.label:
            raise ValueError(f"{type(self).__name__} must define 'type' and 'label'")
        self.config = config or {}

    def connect(self) -> None:
        pass

    def disconnect(self) -> None:
        pass

    def fetch(self, request: FileRequest, local_path: str) -> FetchResult:
        raise NotImplementedError

    def __enter__(self):
        self.connect()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.disconnect()
        return False


class LocalFSStrategy(BaseFetchStrategy):
    """Copy from a local/mounted source tree; ``params['path']`` is the source."""

    type = "file"
    label = "Local filesystem"

    def fetch(self, request: FileRequest, local_path: str) -> FetchResult:
        t0 = time.monotonic()
        result = FetchResult(request=request, local_path=local_path)
        src = request.params.get("path")
        if not src:
            result.error, result.status = "No path in request params", "failed"
            return result
        try:
            os.makedirs(os.path.dirname(local_path), exist_ok=True)
            shutil.copyfile(src, local_path)
            result.bytes_transferred = os.path.getsize(local_path)
            result.success, result.status = True, "complete"
        except OSError as exc:
            result.error, result.status = str(exc), "failed"
        result.duration_seconds = time.monotonic() - t0
        return result


class HTTPFetchStrategy(BaseFetchStrategy):
    """HTTP/HTTPS download with retry + streaming (fetch/http.py:21-183).

    Config: timeout (120), max_retries (3), backoff_factor (1.0),
    chunk_size (8192), headers ({}), user_agent.
    """

    type = "http"
    label = "HTTP/HTTPS"

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        self.timeout = self.config.get("timeout", 120)
        self.max_retries = self.config.get("max_retries", 3)
        self.backoff_factor = self.config.get("backoff_factor", 1.0)
        self.chunk_size = self.config.get("chunk_size", 8192)
        self.headers = dict(self.config.get("headers", {}))
        self.headers.setdefault(
            "User-Agent", self.config.get("user_agent", "georiva-spark/1.0")
        )

    def fetch(self, request: FileRequest, local_path: str) -> FetchResult:
        t0 = time.monotonic()
        result = FetchResult(request=request, local_path=local_path)
        url = request.params.get("url")
        if not url:
            result.error, result.status = "No URL in request params", "failed"
            return result
        attempt = 0
        while True:
            try:
                req = urllib.request.Request(url, headers=self.headers)
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    os.makedirs(os.path.dirname(local_path), exist_ok=True)
                    n = 0
                    with open(local_path, "wb") as out:
                        while True:
                            chunk = resp.read(self.chunk_size)
                            if not chunk:
                                break
                            out.write(chunk)
                            n += len(chunk)
                result.bytes_transferred = n
                result.success, result.status = True, "complete"
                break
            except urllib.error.HTTPError as exc:
                if exc.code in RETRYABLE_HTTP and attempt < self.max_retries:
                    time.sleep(self.backoff_factor * (2 ** attempt))
                    attempt += 1
                    continue
                result.error, result.status = f"HTTP {exc.code}: {exc.reason}", "failed"
                break
            except (urllib.error.URLError, OSError) as exc:
                if attempt < self.max_retries:
                    time.sleep(self.backoff_factor * (2 ** attempt))
                    attempt += 1
                    continue
                result.error, result.status = str(exc), "failed"
                break
        result.duration_seconds = time.monotonic() - t0
        return result


class FTPFetchStrategy(BaseFetchStrategy):
    """Combined FTP / FTPS / SFTP download strategy (fetch/ftp.py:15-120
    serves all three through one ``type='ftp'`` strategy; SFTP connect
    at :91). ``config['protocol']`` picks the transport:

    - ``ftp`` (default) / ``ftps``: stdlib ftplib (FTP_TLS + PROT P for
      ftps), passive mode on by default;
    - ``sftp``: paramiko SSH — password or in-memory ``private_key``
      auth (RSA/Ed25519/ECDSA tried in order). paramiko is not in this
      container, so the connect raises a NAMED NotImplementedError when
      the import fails; everything above the transport (ledger rows,
      retry-in-place, triage) is transport-agnostic and tested against
      a stub connection.

    ``params['path']`` is the remote path; host/user/password/port come
    from config (port defaults 21 for ftp/ftps, 22 for sftp)."""

    type = "ftp"
    label = "FTP/SFTP/FTPS"

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        self.protocol = (self.config.get("protocol") or "ftp").lower()
        if self.protocol not in ("ftp", "ftps", "sftp"):
            raise ValueError(f"unknown protocol {self.protocol!r}")
        self._ftp = None
        self._ssh = None
        self._sftp = None

    def connect(self) -> None:
        if self.protocol == "sftp":
            self._connect_sftp()
        else:
            self._connect_ftp()

    def _connect_ftp(self) -> None:
        import ftplib

        self._ftp = (ftplib.FTP_TLS() if self.protocol == "ftps"
                     else ftplib.FTP())
        self._ftp.connect(
            self.config.get("host", "localhost"),
            self.config.get("port", 21),
            timeout=self.config.get("timeout", 60),
        )
        self._ftp.login(
            self.config.get("user", "anonymous"),
            self.config.get("password", ""),
        )
        if self.protocol == "ftps":
            self._ftp.prot_p()              # encrypt the data channel
        if self.config.get("passive_mode", True):
            self._ftp.set_pasv(True)

    def _connect_sftp(self) -> None:
        try:
            import paramiko
        except ImportError as e:
            raise NotImplementedError(
                "SFTP fetch needs paramiko (not in this container); "
                "ftp/ftps work via stdlib ftplib") from e

        self._ssh = paramiko.SSHClient()
        self._ssh.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        kwargs = {
            "hostname": self.config.get("host", "localhost"),
            "port": self.config.get("port", 22),
            "username": self.config.get("user"),
            "timeout": self.config.get("timeout", 60),
        }
        key_text = self.config.get("private_key")
        if key_text:
            import io
            for cls in (paramiko.RSAKey, paramiko.Ed25519Key,
                        paramiko.ECDSAKey):
                try:
                    kwargs["pkey"] = cls.from_private_key(
                        io.StringIO(key_text))
                    break
                except paramiko.SSHException:
                    continue
            else:
                raise ValueError(
                    "SFTP private_key is not a parseable RSA/Ed25519/"
                    "ECDSA PEM (passphrase-protected keys are not "
                    "supported) — fix the key or use password auth")
        else:
            kwargs["password"] = self.config.get("password")
        self._ssh.connect(**kwargs)
        self._sftp = self._ssh.open_sftp()

    def disconnect(self) -> None:
        if self._sftp is not None:
            try:
                self._sftp.close()
            except Exception:
                pass
            self._sftp = None
        if self._ssh is not None:
            try:
                self._ssh.close()
            except Exception:
                pass
            self._ssh = None
        if self._ftp is not None:
            try:
                self._ftp.quit()
            except Exception:
                try:
                    self._ftp.close()
                except Exception:
                    pass
            self._ftp = None

    def fetch(self, request: FileRequest, local_path: str) -> FetchResult:
        t0 = time.monotonic()
        result = FetchResult(request=request, local_path=local_path)
        path = request.params.get("path")
        if not path:
            result.error, result.status = "No path in request params", "failed"
            return result
        if self._ftp is None and self._sftp is None:
            result.error, result.status = "Not connected", "failed"
            return result
        try:
            os.makedirs(os.path.dirname(local_path), exist_ok=True)
            if self._sftp is not None:
                self._sftp.get(path, local_path)
            else:
                with open(local_path, "wb") as out:
                    self._ftp.retrbinary(f"RETR {path}", out.write)
            result.bytes_transferred = os.path.getsize(local_path)
            result.success, result.status = True, "complete"
        except Exception as exc:
            result.error, result.status = str(exc), "failed"
        result.duration_seconds = time.monotonic() - t0
        return result


STRATEGIES = {
    cls.type: cls for cls in (LocalFSStrategy, HTTPFetchStrategy, FTPFetchStrategy)
}

FETCHED_FILE_SCHEMA = StructType(
    [
        StructField("collection", StringType()),
        StructField("storage_path", StringType()),
        StructField("filename", StringType()),
        StructField("run_id", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("bytes_transferred", LongType()),
        StructField("fetched_at", TimestampType()),
        StructField("request_payload", StringType()),
    ]
)

FETCH_RUN_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("collection", StringType()),
        StructField("resumed_from", StringType()),
        StructField("status", StringType()),
        StructField("files_fetched", LongType()),
        StructField("files_skipped", LongType()),
        StructField("files_failed", LongType()),
        StructField("bytes_transferred", LongType()),
        StructField("started_at", TimestampType()),
        StructField("finished_at", TimestampType()),
        StructField("duration_seconds", DoubleType()),
    ]
)


@dataclass
class CandidateFile:
    """Dry-run classification row (loader.py:195-210)."""

    filename: str
    storage_path: str
    exists: bool


@dataclass
class LoaderRunResult:
    run_id: str = ""
    files_fetched: int = 0
    files_skipped: int = 0
    files_failed: int = 0
    bytes_transferred: int = 0
    errors: list = field(default_factory=list)

    def summary(self) -> str:
        return (
            f"run {self.run_id}: fetched={self.files_fetched} "
            f"skipped={self.files_skipped} failed={self.files_failed} "
            f"bytes={self.bytes_transferred}"
        )


class Loader:
    """Acquisition run: requests → ledger triage → fetch → ledger rows.

    ``data_source`` is any callable ``(collection) -> Iterable[FileRequest]``
    (the reference's ``generate_requests_for_collection``,
    ``sources/models.py:201-227``). ``ledger_dir`` holds two parquet tables:
    ``fetched_files/`` and ``fetch_runs/`` (the FetchedFile / FetchRun rows,
    ``sources/models.py:661,769``).
    """

    def __init__(
        self,
        spark: SparkSession,
        collection: str,
        data_source: Callable[[str], Iterable[FileRequest]],
        fetch_strategy: BaseFetchStrategy,
        landing_dir: str,
        ledger_dir: str,
    ):
        self.spark = spark
        self.collection = collection
        self.data_source = data_source
        self.fetch_strategy = fetch_strategy
        self.landing_dir = landing_dir
        self.ledger_dir = ledger_dir

    # -- ledger -----------------------------------------------------------
    def fetched_files(self) -> DataFrame:
        path = os.path.join(self.ledger_dir, "fetched_files")
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], FETCHED_FILE_SCHEMA)
        return self.spark.read.schema(FETCHED_FILE_SCHEMA).parquet(path)

    def fetch_runs(self) -> DataFrame:
        path = os.path.join(self.ledger_dir, "fetch_runs")
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], FETCH_RUN_SCHEMA)
        return self.spark.read.schema(FETCH_RUN_SCHEMA).parquet(path)

    def _append(self, rows, schema, table):
        from georiva_spark.functions.frames import local_frame
        df = local_frame(self.spark, rows, schema)
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.ledger_dir, table)
        )

    def storage_path(self, request: FileRequest) -> str:
        return f"{self.collection}/{request.filename}"

    # -- triage -----------------------------------------------------------
    def triage(self, requests: list) -> tuple[list, set]:
        """Classify candidates vs the ledger in ONE semi-join.

        Returns ``(to_fetch, existing_paths)``. The candidate side is tiny
        (one run's request list) and is the BROADCAST/build side; the
        ledger side can be billions of rows and streams through the probe
        — it is never collected or broadcast. The semi-join output is
        bounded by the candidate list, so the collect is bounded too.
        Mirrors the skip-if-exists triage at ``sources/loader.py:420-425``.
        """
        if not requests:
            return [], set()
        from georiva_spark.functions.frames import local_frame
        cand = local_frame(
            self.spark,
            [(self.storage_path(r),) for r in requests],
            "storage_path string")
        ledger = self.fetched_files().where(
            (F.col("collection") == self.collection) & (F.col("status") == "complete")
        )
        existing = {
            row[0]
            for row in ledger.join(
                F.broadcast(cand), "storage_path", "left_semi"
            ).select("storage_path").distinct().collect()
        }
        to_fetch = [r for r in requests if self.storage_path(r) not in existing]
        return to_fetch, existing

    def check_new_files(self) -> list:
        """Read-only dry run: classify, persist nothing (loader.py:195-210)."""
        requests = list(self.data_source(self.collection))
        _, existing = self.triage(requests)
        return [
            CandidateFile(
                filename=r.filename,
                storage_path=self.storage_path(r),
                exists=self.storage_path(r) in existing,
            )
            for r in requests
        ]

    def fetch_one(self, request: FileRequest) -> FetchResult:
        """Unconditional single-file fetch — the per-file retry primitive
        (loader.py:211-226). Owns connect/disconnect; records nothing."""
        self.fetch_strategy.connect()
        try:
            dest = os.path.join(self.landing_dir, self.collection, request.filename)
            return self.fetch_strategy.fetch(request, dest)
        finally:
            try:
                self.fetch_strategy.disconnect()
            except Exception:
                pass

    def refetch(self, request_payload: str) -> FetchResult:
        """Re-fetch one file from its persisted ledger payload."""
        return self.fetch_one(FileRequest.from_dict(json.loads(request_payload)))

    def run(
        self,
        *,
        dry_run: bool = False,
        max_files: Optional[int] = None,
        skip_existing: bool = True,
        resumed_from: Optional[str] = None,
    ) -> LoaderRunResult:
        started = datetime.utcnow()
        run_id = f"{self.collection}-{started.strftime('%Y%m%dT%H%M%S%f')}"
        result = LoaderRunResult(run_id=run_id)

        requests = list(self.data_source(self.collection))
        # Event-sourced state machine: a 'running' row lands BEFORE any
        # fetch, so a hard worker death leaves a visible stranded run for
        # recover_stale_runs to sweep (the reference's FetchRun.RUNNING
        # row, acquisition_recovery.py). Status = latest row per run_id.
        if not dry_run:
            self._append(
                [(run_id, self.collection, resumed_from, "running",
                  0, 0, 0, 0, started, None, None)],
                FETCH_RUN_SCHEMA, "fetch_runs",
            )
        if skip_existing:
            to_fetch, existing = self.triage(requests)
            result.files_skipped = len(existing)
        else:
            to_fetch = requests
        if max_files is not None:
            to_fetch = to_fetch[:max_files]
        if dry_run:
            return result

        rows = []
        self.fetch_strategy.connect()
        try:
            for request in to_fetch:
                dest = os.path.join(
                    self.landing_dir, self.collection, request.filename
                )
                try:
                    fr = self.fetch_strategy.fetch(request, dest)
                except Exception as exc:  # per-file isolation (loader run loop)
                    fr = FetchResult(
                        request=request, error=str(exc), status="failed"
                    )
                if fr.success:
                    result.files_fetched += 1
                    result.bytes_transferred += fr.bytes_transferred
                else:
                    result.files_failed += 1
                    result.errors.append(f"{request.filename}: {fr.error}")
                try:
                    payload = json.dumps(request.to_dict())
                except Exception:
                    payload = None  # null payload disables per-file retry
                rows.append(
                    (
                        self.collection,
                        self.storage_path(request),
                        request.filename,
                        run_id,
                        fr.status,
                        fr.error,
                        fr.bytes_transferred,
                        datetime.utcnow(),
                        payload,
                    )
                )
        finally:
            try:
                self.fetch_strategy.disconnect()
            except Exception:
                pass

        if rows:
            self._append(rows, FETCHED_FILE_SCHEMA, "fetched_files")
        finished = datetime.utcnow()
        self._append(
            [
                (
                    run_id,
                    self.collection,
                    resumed_from,
                    "completed" if not result.files_failed else "completed_with_errors",
                    result.files_fetched,
                    result.files_skipped,
                    result.files_failed,
                    result.bytes_transferred,
                    started,
                    finished,
                    (finished - started).total_seconds(),
                )
            ],
            FETCH_RUN_SCHEMA,
            "fetch_runs",
        )
        return result

    # -- state views (latest event per key) -------------------------------
    def runs_latest(self) -> DataFrame:
        """Current status per run: latest event row per run_id. The raw
        ``fetch_runs`` table is the append-only event log."""
        from pyspark.sql import Window

        # latest event wins: counter-recompute rows share started_at with
        # the terminal row they correct, so order on the event's own time
        # (finished_at; running rows have none and lose all ties)
        w = Window.partitionBy("run_id").orderBy(
            F.coalesce(F.col("finished_at"), F.col("started_at")).desc(),
            F.when(F.col("status") == "running", 1).otherwise(0),
        )
        return (self.fetch_runs()
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn"))

    def files_latest(self) -> DataFrame:
        """Current status per storage_path (latest fetched_files event) —
        per-file retries append rows for the same path."""
        from pyspark.sql import Window

        w = Window.partitionBy("storage_path").orderBy(
            F.col("fetched_at").desc())
        return (self.fetched_files()
                .where(F.col("collection") == self.collection)
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn"))

    def run_counters(self, run_id: str) -> dict:
        """Truthful counters recomputed from a run's child file rows
        (``FetchRun.recompute_counters``, acquisition_retry.py) — one
        aggregate over the ledger, no driver loop."""
        # children = every storage_path with an event in this run; their
        # CURRENT state is the latest event per path (a retry appends a
        # superseding row — counting raw events would keep the stale
        # failure in the totals forever)
        children = (self.fetched_files()
                    .where(F.col("run_id") == run_id)
                    .select("storage_path").distinct())
        row = (self.files_latest()
               .join(F.broadcast(children), "storage_path", "left_semi")
               .agg(
                   F.count(F.when(F.col("status") == "complete", 1))
                   .alias("files_fetched"),
                   F.count(F.when(F.col("status") == "failed", 1))
                   .alias("files_failed"),
                   F.coalesce(F.sum(F.when(F.col("status") == "complete",
                                           F.col("bytes_transferred"))),
                              F.lit(0)).alias("bytes_transferred"),
               ).collect()[0])
        return row.asDict()

    # -- per-file retry (acquisition_retry.py) ----------------------------
    def retry_file(self, storage_path: str) -> FetchResult:
        """Re-fetch one failed file in place from its stored request
        payload; the same storage_path walks the state machine again via
        a new ledger event, and the parent run's counters are recomputed
        from its children (``retry_fetch``, acquisition_retry.py:34-60).
        """
        cur = (self.files_latest()
               .where(F.col("storage_path") == storage_path).collect())
        if not cur:
            raise RetryNotPossible(f"no ledger record for {storage_path}")
        rec = cur[0]
        if not rec.request_payload:
            raise RetryNotPossible("no stored request on this record")
        request = FileRequest.from_dict(json.loads(rec.request_payload))
        fr = self.fetch_one(request)
        self._append(
            [(self.collection, storage_path, request.filename, rec.run_id,
              fr.status, fr.error, fr.bytes_transferred, datetime.utcnow(),
              rec.request_payload)],
            FETCHED_FILE_SCHEMA, "fetched_files",
        )
        counters = self.run_counters(rec.run_id)
        prior = (self.runs_latest()
                 .where(F.col("run_id") == rec.run_id).collect())
        if prior:
            p = prior[0]
            finished = datetime.utcnow()
            self._append(
                [(rec.run_id, self.collection, p.resumed_from,
                  "completed" if not counters["files_failed"]
                  else "completed_with_errors",
                  counters["files_fetched"], p.files_skipped,
                  counters["files_failed"], counters["bytes_transferred"],
                  p.started_at, finished,
                  (finished - p.started_at).total_seconds())],
                FETCH_RUN_SCHEMA, "fetch_runs",
            )
        return fr

    # -- stale-run recovery sweep (acquisition_recovery.py) ---------------
    def recover_stale_runs(
        self,
        *,
        stale_after_seconds: float = 6 * 3600,
        run_ids: Optional[list] = None,
        resume: bool = True,
        max_auto_resumes: int = 2,
        now: Optional[datetime] = None,
    ) -> dict:
        """Declare runs dead on age, mark them interrupted, auto-resume.

        Mirrors ``recover_stale_runs`` (acquisition_recovery.py:40-110):
        a hard worker death strands a run in 'running'; the sweep fails
        its dangling files, freezes truthful counters, appends an
        'interrupted' event, and re-runs the loader (skip_existing
        dedupes what already landed). Auto-resume is capped per original
        run by walking ``resumed_from`` lineage, so a poison file parks
        after ``max_auto_resumes`` attempts instead of looping forever.
        ``run_ids`` sweeps exactly those runs regardless of age (the
        operator is asserting they are dead); ``stale_after_seconds=0``
        is the hard sweep.
        """
        now = now or datetime.utcnow()
        latest = self.runs_latest()
        stale = latest.where(F.col("status") == "running")
        if run_ids is not None:
            stale = stale.where(F.col("run_id").isin(list(run_ids)))
        else:
            cutoff = now - timedelta(seconds=stale_after_seconds)
            stale = stale.where(F.col("started_at") < cutoff)
        stale_rows = stale.orderBy("started_at").collect()

        # resume lineage depth per root: resumed_from chains, computed
        # once from the (bounded) run table
        lineage = {r.run_id: r.resumed_from
                   for r in latest.select("run_id", "resumed_from").collect()}

        def depth(run_id: str) -> int:
            d = 0
            cur = lineage.get(run_id)
            while cur is not None and d <= max_auto_resumes:
                d += 1
                cur = lineage.get(cur)
            return d

        swept = resumed = 0
        for run in stale_rows:
            # fail dangling files (rows stuck without a terminal event
            # can't exist in this append-only design — in-flight files
            # simply have no row yet; nothing to mark)
            counters = self.run_counters(run.run_id)
            finished = datetime.utcnow()
            self._append(
                [(run.run_id, self.collection, run.resumed_from,
                  "interrupted", counters["files_fetched"],
                  run.files_skipped, counters["files_failed"],
                  counters["bytes_transferred"], run.started_at, finished,
                  (finished - run.started_at).total_seconds())],
                FETCH_RUN_SCHEMA, "fetch_runs",
            )
            swept += 1
            if resume and depth(run.run_id) < max_auto_resumes:
                self.run(resumed_from=run.run_id)
                resumed += 1
        return {"swept": swept, "resumed": resumed}
