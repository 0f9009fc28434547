"""Orphan-asset GC selection (core/tests/test_asset_cleanup.py) — pure
list contract + the distributed anti-join path, plus auto-tier routing
(sources/tests/test_auto_tier.py)."""

from georiva_spark.plans.declarations import (
    DerivedProductDefinition, InputRef, OutputRef,
)
from georiva_spark.plans.products import (
    ProductRow, collection_routes_to_staging,
)
from georiva_spark.sources.asset_cleanup import (
    DELETABLE_EXTENSIONS, orphan_objects_df, select_orphan_objects,
)

OBJECTS = [
    "chirps/monthly/precip/2026/05/01/precip_000000.tif",   # live
    "chirps/monthly/precip/2026/05/01/precip_000000.png",   # live
    "chirps/monthly/precip/2026/05/01/precip_stale.tif",    # orphan
    "chirps/monthly/precip/2026/05/01/precip_stale.png",    # orphan
    "chirps/monthly/precip/2026/05/01/precip_000000.json",  # sidecar — keep
    "chirps/monthly/precip/2026/05/01/notes.txt",           # non-asset — keep
]
LIVE = {
    "chirps/monthly/precip/2026/05/01/precip_000000.tif",
    "chirps/monthly/precip/2026/05/01/precip_000000.png",
}
EXPECTED = [
    "chirps/monthly/precip/2026/05/01/precip_stale.png",
    "chirps/monthly/precip/2026/05/01/precip_stale.tif",
]


def test_select_orphan_objects_pure():
    got = select_orphan_objects(OBJECTS, LIVE, DELETABLE_EXTENSIONS)
    assert sorted(got) == EXPECTED
    # uppercase extension still selected; live path never selected
    assert select_orphan_objects(["a/B.TIF"], set()) == ["a/B.TIF"]
    assert select_orphan_objects(["a/b.tif"], {"a/b.tif"}) == []


def test_orphan_objects_df_matches_pure(spark):
    listing = spark.createDataFrame([(p,) for p in OBJECTS], ["path"])
    live = spark.createDataFrame([(h,) for h in LIVE], ["href"])
    got = sorted(r.path for r in orphan_objects_df(listing, live).collect())
    assert got == EXPECTED


def test_collection_routes_to_staging():
    defs = [DerivedProductDefinition(
        key="anomaly", recipe_type="climatology", label="Anomaly",
        inputs=(InputRef(role="value", collection="rainfall",
                         tier="staging"),),
        outputs=(OutputRef(role="out", collection="rainfall-anomaly"),))]
    rows = {"anomaly": ProductRow("anomaly", is_enabled=True)}
    assert collection_routes_to_staging(defs, rows, "rainfall")
    # disabled product → publishes directly ("no derivation, no staging")
    rows["anomaly"].is_enabled = False
    assert not collection_routes_to_staging(defs, rows, "rainfall")
    rows["anomaly"].is_enabled = True
    # a published-tier input does not route to staging
    defs2 = [DerivedProductDefinition(
        key="anomaly", recipe_type="climatology", label="Anomaly",
        inputs=(InputRef(role="value", collection="rainfall",
                         tier="published"),),
        outputs=(OutputRef(role="out", collection="rainfall-anomaly"),))]
    assert not collection_routes_to_staging(defs2, rows, "rainfall")
    # unrelated collection
    assert not collection_routes_to_staging(defs, rows, "other")
