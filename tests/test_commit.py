"""Commit-protocol contract (r12 — the r11 verdict's items 2+3 and
ADVICE items 2-4): every atomic-rename/marker assumption funnels
through sources/commit.py and fails BY NAME on filesystems that fake
rename; item identity is md5-derived (restart-stable, 60-bit); the
exactly-once delta export cleans up stale staging dirs on replay."""

import json
import os
import subprocess
import sys

import pytest

from georiva_spark.sources import commit


# ---- require_rename_fs: the POSIX-vs-object-store gate ---------------------

def test_local_and_hdfs_paths_pass():
    assert commit.require_rename_fs("/tmp/x") == "/tmp/x"
    assert commit.require_rename_fs("rel/path") == "rel/path"
    assert commit.require_rename_fs("file:///tmp/x") == "/tmp/x"
    assert commit.require_rename_fs("hdfs://nn/x") == "hdfs://nn/x"


def test_single_slash_uri_form(tmp_path):
    """r13 (ADVICE): Spark/Hadoop paths typically carry the
    single-slash URI form ('file:/x', what spark.sql.warehouse.dir
    holds) — it must parse as scheme 'file' and strip to a local
    path, and the object-store gate must catch 's3a:/b/k' too."""
    assert commit.path_scheme("file:/tmp/x") == "file"
    assert commit.require_rename_fs("file:/tmp/x") == "/tmp/x"
    with pytest.raises(ValueError, match="object store"):
        commit.require_rename_fs("s3a:/bucket/key")
    # a write through the single-slash form must actually land
    p = f"file:{tmp_path}/m/tok.json"
    commit.atomic_write_json(p, {"ok": 1})
    with open(os.path.join(tmp_path, "m", "tok.json")) as f:
        assert json.load(f) == {"ok": 1}
    commit.atomic_replace(f"file:{tmp_path}/m/tok.json",
                          f"file://{tmp_path}/m/tok2.json")
    assert os.path.exists(os.path.join(tmp_path, "m", "tok2.json"))


@pytest.mark.parametrize("path", [
    "s3://bucket/key", "s3a://bucket/key", "gs://bucket/key",
    "abfss://fs@acct/x", "wasb://c@a/x",
])
def test_object_store_paths_fail_by_name(path):
    with pytest.raises(ValueError, match="object store"):
        commit.require_rename_fs(path, who="unit-test")


def test_unknown_scheme_fails_closed():
    with pytest.raises(ValueError, match="rename-atomic"):
        commit.require_rename_fs("ftp://host/x")


def test_windows_drive_letter_is_not_a_scheme():
    # c://... is pathological, but a single letter must never be
    # treated as a URI scheme
    assert commit.path_scheme("C://x") == ""
    assert commit.path_scheme("/a/b://c") == ""
    assert commit.path_scheme("s3a://b") == "s3a"


def test_atomic_write_json_round_trip_and_no_tmp_residue(tmp_path):
    p = str(tmp_path / "m" / "marker.json")
    commit.atomic_write_json(p, {"digest": "d-1"})
    with open(p) as f:
        assert json.load(f) == {"digest": "d-1"}
    # overwrite is atomic replace, tmp siblings cleaned up
    commit.atomic_write_json(p, {"digest": "d-2"})
    with open(p) as f:
        assert json.load(f) == {"digest": "d-2"}
    assert [f for f in os.listdir(tmp_path / "m")
            if f.endswith(".tmp")] == []


def test_generation_marker_refuses_object_store():
    from georiva_spark.sources.tables import commit_generation_marker
    with pytest.raises(ValueError, match="object store"):
        commit_generation_marker("s3a://bucket/layout", "g1", "d")


def test_upsert_refuses_object_store(spark):
    from georiva_spark.functions.frames import local_frame
    from georiva_spark.sources.catalog_store import upsert_by_key
    df = local_frame(spark, [(1, "a")], "k long, v string")
    # the flat path guards only once a merge is needed; the
    # first-write path writes through Spark's FS layer (which would
    # itself need an object-store connector). Exercise the merge
    # guard with a pre-existing local table semantics: the
    # partitioned path guards before reading.
    with pytest.raises(ValueError, match="object store"):
        upsert_by_key(df, "s3a://bucket/items", ["k"],
                      partition_by=["k"])


# ---- the commit backend seam (r13) -----------------------------------------


def test_pointer_backend_token_protocol():
    """Manifest-pointer commits: blob first (immutable, digest-named,
    put-if-absent), pointer PUT is the commit; a crash between the
    two reads as UNCOMMITTED; replays are idempotent; a lost
    last-writer-wins race fails by name."""
    store = commit.MemoryObjectStore()
    b = commit.PointerBackend(store)
    p = "/layout/_georiva_gens/g1.json"
    assert b.read_token(p) is None
    b.write_token(p, b'{"digest": "d-1"}')
    assert b.read_token(p) == b'{"digest": "d-1"}'
    # replay: same bytes -> same blob digest, pointer re-put, no error
    b.write_token(p, b'{"digest": "d-1"}')
    assert b.read_token(p) == b'{"digest": "d-1"}'
    # crash window: blob landed, pointer never did -> uncommitted
    p2 = "/layout/_georiva_gens/g2.json"
    d = commit.PointerBackend._digest(b"half")
    store.put_if_absent(f"{p2}{commit.BLOB_SUFFIX}{d}", b"half")
    assert b.read_token(p2) is None
    b.write_token(p2, b"half")              # the replay completes it
    assert b.read_token(p2) == b"half"
    # last-writer-wins detection: another writer's pointer wins the
    # race between our PUT and our read-back
    class RacedStore(commit.MemoryObjectStore):
        def put(self, key, data):
            super().put(key, data)
            if key == "/layout/tok":        # the rival overwrites
                super().put(key, b"feedbeef" * 4)
    rb = commit.PointerBackend(RacedStore())
    with pytest.raises(ValueError, match="single-writer"):
        rb.write_token("/layout/tok", b"mine")
    # a pointer whose blob vanished is tampering, not "uncommitted"
    gone = commit.PointerBackend._digest(b'{"digest": "d-1"}')
    store.delete(p + commit.BLOB_SUFFIX + gone)
    with pytest.raises(ValueError, match="blob is missing"):
        b.read_token(p)


def test_pointer_backend_install_file(tmp_path):
    """install_file put-if-absents the final data name: a replay with
    identical bytes is a no-op, different content at the same name
    fails by name (immutable layout), and the staged source is
    consumed either way."""
    store = commit.MemoryObjectStore()
    b = commit.PointerBackend(store)
    src = tmp_path / "staged.parquet"
    src.write_bytes(b"DATA-1")
    b.install_file(str(src), "/layout/shard=0/gen-g1-0000.parquet")
    assert store.get("/layout/shard=0/gen-g1-0000.parquet") == b"DATA-1"
    assert not src.exists()                  # staged file consumed
    src.write_bytes(b"DATA-1")               # replay: identical bytes
    b.install_file(str(src), "/layout/shard=0/gen-g1-0000.parquet")
    assert not src.exists()
    src.write_bytes(b"DATA-2")               # a silent swap attempt
    with pytest.raises(ValueError, match="DIFFERENT content"):
        b.install_file(str(src),
                       "/layout/shard=0/gen-g1-0000.parquet")


def test_backend_routing_prefix_and_scheme(tmp_path):
    """backend_for routes: registered path prefix wins, registered
    scheme unlocks object-store paths (the escape hatch the
    fail-by-name error names), unregistering restores the refusal."""
    pb = commit.PointerBackend(commit.MemoryObjectStore())
    assert isinstance(commit.backend_for("/tmp/x"),
                      commit.RenameBackend)
    try:
        commit.register_backend(str(tmp_path), pb)
        assert commit.backend_for(str(tmp_path / "m.json")) is pb
        assert isinstance(commit.backend_for("/elsewhere/x"),
                          commit.RenameBackend)
        # scheme registration turns the s3a refusal into a commit
        with pytest.raises(ValueError, match="register_backend"):
            commit.backend_for("s3a://bucket/k")
        commit.register_backend("s3a", pb)
        assert commit.backend_for("s3a://bucket/k") is pb
        commit.atomic_write_json("s3a://bucket/lay/_gens/g.json",
                                 {"digest": "d"})
        assert commit.read_token_json(
            "s3a://bucket/lay/_gens/g.json") == {"digest": "d"}
    finally:
        commit.register_backend(str(tmp_path), None)
        commit.register_backend("s3a", None)
    with pytest.raises(ValueError, match="object store"):
        commit.backend_for("s3a://bucket/k")


def test_s3_object_store_against_moto():
    """r13: the real S3 adapter (boto3 conditional writes) behind the
    pointer backend, exercised against moto's S3 mock — PutObject
    If-None-Match as put_if_absent, 412 on conflict, the full
    generation-marker chain through register_backend('s3a', …): the
    exact escape hatch the fail-by-name error names."""
    boto3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="lake")
        store = commit.S3ObjectStore(client=client)
        # conditional create: first wins, second sees the conflict
        assert store.put_if_absent("s3a://lake/a/blob", b"one")
        assert not store.put_if_absent("s3a://lake/a/blob", b"two")
        assert store.get("s3a://lake/a/blob") == b"one"
        assert store.get("s3a://lake/a/missing") is None
        store.delete("s3a://lake/a/blob")
        assert store.get("s3a://lake/a/blob") is None
        # the full escape hatch: markers commit on s3a:// instead of
        # failing by name
        backend = commit.PointerBackend(store)
        try:
            commit.register_backend("s3a", backend)
            from georiva_spark.sources.tables import \
                commit_generation_marker
            commit_generation_marker("s3a://lake/layout", "g1", "d-9")
            assert commit.read_token_json(
                "s3a://lake/layout/_georiva_gens/g1.json"
            ) == {"digest": "d-9"}
            # replay: same digest, idempotent
            commit_generation_marker("s3a://lake/layout", "g1", "d-9")
            # crash window on S3: blob landed, pointer lost
            p = "s3a://lake/layout/_georiva_gens/g2.json"
            d = commit.PointerBackend._digest(b"{}")
            store.put_if_absent(p + commit.BLOB_SUFFIX + d, b"{}")
            assert commit.read_token(p) is None
        finally:
            commit.register_backend("s3a", None)
    with pytest.raises(ValueError, match="object store"):
        commit.backend_for("s3a://lake/layout/x")


@pytest.fixture(params=["rename", "pointer"])
def layout_backend(request, tmp_path):
    """The SAME exactly-once layout protocol runs against both commit
    backends: 'rename' is the POSIX default; 'pointer' registers a
    PointerBackend over the no-rename DirObjectStore shim for the
    layout prefix (data files are real files so Spark sees them, but
    every marker/install goes through the pointer protocol — zero
    os.replace)."""
    layout = str(tmp_path / f"layout_{request.param}")
    if request.param == "pointer":
        commit.register_backend(
            layout, commit.PointerBackend(commit.DirObjectStore()))
    yield layout, request.param
    commit.register_backend(layout, None)


def test_delta_exactly_once_on_both_backends(spark, layout_backend,
                                             tmp_path):
    """r13 (the r12 verdict's top item): the token-shard delta's
    failure-injection suite — replay no-op, changed-content refusal,
    marker crash window, stale staging cleanup — runs green against
    BOTH commit backends; on the pointer backend the marker is a
    digest pointer + blob, never a renamed file."""
    import shutil

    from georiva_spark.functions.frames import local_frame
    from georiva_spark.sources.tables import (export_token_shards,
                                              export_token_shards_delta)
    layout, kind = layout_backend
    merges = [("a", "b")]
    base = local_frame(spark, [(1, "ab a b")],
                       "doc_id long, text string")
    export_token_shards(base, layout, merges, context_len=8,
                        num_shards=2, extra_alphabet="ab ")
    delta = local_frame(spark, [(2, "b a ab")],
                        "doc_id long, text string")
    man = export_token_shards_delta(delta, layout, merges,
                                    generation="g1")
    assert man.agg({"n_docs": "sum"}).head()[0] == 2
    marker = os.path.join(layout, "_georiva_gens", "g1.json")
    if kind == "pointer":
        # the marker is a POINTER (digest), its bytes live in the blob
        with open(marker) as f:
            ptr = f.read()
        assert json.loads(
            open(f"{marker}{commit.BLOB_SUFFIX}{ptr}").read()
        )["digest"]
    # 1. replay no-op (identical content): manifest unchanged, and a
    #    stale staging dir from a crash after marker-commit is removed
    stale = os.path.join(layout, "_staging_g1")
    os.makedirs(os.path.join(stale, "shard=0"), exist_ok=True)
    with open(os.path.join(stale, "shard=0", "x.parquet"), "wb") as f:
        f.write(b"junk")
    man = export_token_shards_delta(delta, layout, merges,
                                    generation="g1")
    assert not os.path.exists(stale)
    assert man.agg({"n_docs": "sum"}).head()[0] == 2
    # 2. changed content under a committed generation fails by name
    changed = local_frame(spark, [(3, "a b ab b")],
                          "doc_id long, text string")
    with pytest.raises(ValueError, match="DIFFERENT content"):
        export_token_shards_delta(changed, layout, merges,
                                  generation="g1")
    # 3. marker crash window: simulate a crash BETWEEN the staged
    #    installs and the marker commit for g2 — the marker reads as
    #    uncommitted, and the retry completes exactly-once
    delta2 = local_frame(spark, [(3, "a b ab b")],
                         "doc_id long, text string")
    from georiva_spark.sources import tables as tables_mod
    real_commit = tables_mod.commit_generation_marker

    def crash_before_marker(path, generation, digest):
        raise RuntimeError("injected crash before marker")

    tables_mod.commit_generation_marker = crash_before_marker
    try:
        with pytest.raises(RuntimeError, match="injected"):
            export_token_shards_delta(delta2, layout, merges,
                                      generation="g2")
    finally:
        tables_mod.commit_generation_marker = real_commit
    assert commit.read_token(
        os.path.join(layout, "_georiva_gens", "g2.json")) is None
    man = export_token_shards_delta(delta2, layout, merges,
                                    generation="g2")   # the retry
    assert man.agg({"n_docs": "sum"}).head()[0] == 3
    # doc 3 appears EXACTLY once across the layout despite the crash
    n3 = (spark.read.option("basePath", layout)
          .parquet(f"{layout}/shard=*")
          .selectExpr("explode(doc_ids) AS d").where("d = 3").count())
    assert n3 == 1
    shutil.rmtree(layout, ignore_errors=True)


# ---- stable_item_id: md5 identity (the _code_ref policy) -------------------

def test_stable_item_id_is_hashseed_independent():
    code = ("from georiva_spark.plans.recipe import stable_item_id;"
            "print(stable_item_id('crawl', 's1'),"
            " stable_item_id('grid', 'c', 'v', None))")
    outs = set()
    for seed in ("1", "2", "random"):
        env = dict(os.environ, PYTHONHASHSEED=seed,
                   PYTHONPATH="/root/repo")
        outs.add(subprocess.run(
            [sys.executable, "-c", code], env=env, check=True,
            capture_output=True, text=True).stdout.strip())
    assert len(outs) == 1


def test_stable_item_id_width_and_distinctness():
    from georiva_spark.plans.recipe import stable_item_id
    a = stable_item_id("crawl", "s1")
    assert 0 < a < 2 ** 60
    assert a == stable_item_id("crawl", "s1")
    assert a != stable_item_id("crawl", "s2")
    # None is not the string "None", and part boundaries matter
    assert stable_item_id("g", "c", None) != stable_item_id("g", "c",
                                                            "None")
    assert stable_item_id("ab", "c") != stable_item_id("a", "bc")


# ---- stale staging cleanup on the delta-export replay path -----------------

def test_delta_replay_removes_stale_staging_dir(spark, tmp_path):
    from georiva_spark.functions.frames import local_frame
    from georiva_spark.sources.tables import (export_token_shards,
                                              export_token_shards_delta)
    merges = [("a", "b")]
    base = local_frame(spark, [(1, "ab a b")],
                       "doc_id long, text string")
    layout = str(tmp_path / "layout")
    export_token_shards(base, layout, merges, context_len=8,
                        num_shards=2, extra_alphabet="ab ")
    delta = local_frame(spark, [(2, "b a ab")],
                        "doc_id long, text string")
    export_token_shards_delta(delta, layout, merges, generation="g1")
    # simulate a crash between marker-commit and staging cleanup
    stale = os.path.join(layout, "_staging_g1")
    os.makedirs(os.path.join(stale, "shard=0"), exist_ok=True)
    with open(os.path.join(stale, "shard=0", "x.parquet"), "wb") as f:
        f.write(b"junk")
    man = export_token_shards_delta(delta, layout, merges,
                                    generation="g1")   # replay no-op
    assert not os.path.exists(stale)
    assert man.agg({"n_docs": "sum"}).head()[0] == 2


# ---- stale fixture sweep (r13: the r12 ADVICE leak) -------------------------


def test_sweep_stale_fixtures_spares_live_apps(spark, tmp_path):
    """Retraction-query fixtures from PRIOR apps (dead: older than the
    age gate) are swept at query start; the CURRENT app's fixtures and
    any RECENT other-app fixtures (a concurrent evaluation) survive."""
    import tempfile
    import time

    from georiva_spark.queries_ext import _sweep_stale_fixtures
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = "/" + wh[len("file:"):].lstrip("/")
    raw_app = spark.sparkContext.applicationId
    import re as _re
    app = _re.sub(r"[^0-9a-zA-Z]", "", raw_app)[-12:]
    old = time.time() - 4 * 3600
    mk = []

    def bless(p, stale):
        os.makedirs(p, exist_ok=True)
        if stale:
            os.utime(p, (old, old))
        mk.append(p)

    # warehouse: stale other-app (goes), fresh other-app (stays),
    # current-app stale-looking (stays — never sweep ourselves)
    bless(os.path.join(wh, "t_swtest_deadapp00001_bands"), True)
    bless(os.path.join(wh, "t_swtest_otherapp0002_dead"), False)
    bless(os.path.join(wh, f"t_swtest_{app.lower()}_bands"), True)
    # tmp: stale other-app (goes), current-app (stays)
    td = tempfile.gettempdir()
    bless(os.path.join(td, "georiva_spark_swt_app-dead-1"), True)
    bless(os.path.join(td, f"georiva_spark_swt_{raw_app}"), True)
    try:
        _sweep_stale_fixtures(spark, "t_swtest", "swt")
        assert not os.path.exists(mk[0])      # stale other-app: gone
        assert os.path.exists(mk[1])          # fresh other-app: kept
        assert os.path.exists(mk[2])          # current app: kept
        assert not os.path.exists(mk[3])      # stale tmp: gone
        assert os.path.exists(mk[4])          # current tmp: kept
    finally:
        import shutil
        for p in mk:
            shutil.rmtree(p, ignore_errors=True)


# ---- concurrent evaluations: app-id-suffixed fixture dirs ------------------

def test_concurrent_corpus_products_evaluations():
    """r12 (the r11 verdict's item 5): the driver correctness probe
    and a local bench run are separate Spark apps that may evaluate
    the same in-query-engine query at once — with the old shared
    fixture dir one rmtree'd the other mid-flight. Two real JVMs now
    run q_corpus_products concurrently and both must succeed (each
    writes under its own application-id-suffixed dir)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[8]')\n"
        "         .config('spark.sql.shuffle.partitions', '8')\n"
        "         .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "from georiva_spark.queries import QUERIES\n"
        "df = QUERIES['corpus_products'](spark,"
        " '/root/testdata/sf0.001')\n"
        "print('ROWS', df.count())\n")
    procs = [subprocess.Popen([sys.executable, "-c", code],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for _ in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out, err[-2000:]))
    for rc, out, err in outs:
        assert rc == 0, (rc, err)
        assert b"ROWS" in out, (out, err)
