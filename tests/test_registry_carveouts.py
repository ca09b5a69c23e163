"""The rows-only carve-out set is closed: a query may ship without a
DuckDB oracle ONLY by being listed (with its reason) in
registry.ROWS_ONLY_CARVEOUTS — this is what keeps the driver's weaker
rows-only check from silently becoming the default for new operators.
"""

from __future__ import annotations

from data_engineering_project_spotify_app_spark.operators import registry

registry.load_all_modules()


def test_rows_only_set_is_exactly_the_carveout_list():
    no_oracle = {n for n in registry.QUERIES if n not in registry.ORACLES}
    listed = set(registry.ROWS_ONLY_CARVEOUTS)
    unlisted = no_oracle - listed
    assert not unlisted, (
        f"queries registered rows-only without a documented carve-out: "
        f"{sorted(unlisted)} — add an oracle, or add them to "
        f"registry.ROWS_ONLY_CARVEOUTS with the reason"
    )
    stale = listed - no_oracle
    assert not stale, (
        f"carve-out entries that now have oracles (or no longer exist): "
        f"{sorted(stale)} — prune them"
    )


def test_every_carveout_reason_names_its_test_pin():
    """Each carve-out must say where its correctness evidence lives."""
    for name, reason in registry.ROWS_ONLY_CARVEOUTS.items():
        assert "tests/" in reason, (name, reason)
