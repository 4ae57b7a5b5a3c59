"""Every registered query must be TOTAL on empty inputs.

At 100 TB an empty source is routine — a new partition/day/tenant with
no data yet, a filter that matches nothing, a first incremental run.
An operator that crashes on zero rows takes the whole pipeline down
(ADVICE r01 found exactly this class of bug in audio_energy_windows:
``max(range(0))``). This sweep runs the FULL registry against a
zero-row schema-mirror of the testdata and asserts each query executes
and returns a well-formed (possibly empty) result.

The one intentional exception: ``manifest_wap_roundtrip``'s
write-audit-publish AUDIT gate rejects an empty publish by design —
asserted to raise its typed AuditError, not an arbitrary crash.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

# Queries whose CONTRACT is to reject empty input (typed error asserted
# separately below) — everything else must run.
EXPECTED_REJECT = {"manifest_wap_roundtrip"}


@pytest.fixture(scope="session")
def empty_sf(tmp_path_factory) -> str:
    """Zero-row parquet mirror of every testdata table (same schemas)."""
    d = tmp_path_factory.mktemp("empty_sf")
    for f in sorted(os.listdir(SF_DIR)):
        if f.endswith(".parquet"):
            sch = pq.read_schema(os.path.join(SF_DIR, f))
            pq.write_table(sch.empty_table(), str(d / f))
    return str(d)


@pytest.mark.parametrize(
    "name", [k for k in entrymod.queries() if k not in EXPECTED_REJECT]
)
def test_query_total_on_empty_input(spark, empty_sf, name):
    fn = entrymod.queries()[name]
    rows = fn(spark, empty_sf).collect()
    assert isinstance(rows, list)  # executed; emptiness is fine


def test_manifest_wap_rejects_empty_publish(spark, empty_sf):
    from tinymapreduce_spark.sources.manifest_sink import AuditError

    with pytest.raises(AuditError):
        entrymod.queries()["manifest_wap_roundtrip"](spark, empty_sf).collect()
