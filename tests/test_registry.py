

def test_driver_window_composition():
    """The driver hash-checks only the first DRIVER_WINDOW entries of
    queries().  Rotation invariants: every window entry is oracle-backed
    (rows-only checks waste a slot), no already-driver-green name
    occupies a slot while never-verified oracle-backed queries wait, and
    the round-3 fixed/new queries are all inside."""
    from splitserve_spark.registry import (
        DRIVER_WINDOW, REGISTRY, _DRIVER_GREEN, driver_window,
        ordered_registry,
    )
    w = driver_window()
    assert len(w) == DRIVER_WINDOW
    assert all(REGISTRY[n].oracle is not None for n in w), w
    waiting = [
        n for n in ordered_registry()
        if n not in w and n not in _DRIVER_GREEN and REGISTRY[n].oracle
    ]
    greens_in_window = [n for n in w if n in _DRIVER_GREEN]
    assert not (waiting and greens_in_window), (waiting, greens_in_window)
    for must in (
        "q12_shipping_lateness", "fn_map_functions", "sessionize_lag_cumsum",
        "stream_stateful_profile", "fn_na_replace", "source_orc_roundtrip",
        "join_shuffled_hash", "join_natural", "sort_within_partitions",
    ):
        assert must in w, must
