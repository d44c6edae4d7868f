

def test_sessionize_islands_and_boundary_rule(spark):
    # hand-built series: gaps of exactly the timeout stay IN-session
    # (strict >); ties on ts break by event_id deterministically.
    import pandas as pd

    from yatsm_spark.operators.sessionize import session_stats, sessionize

    base = pd.Timestamp("2025-06-01 00:00:00")
    rows = [
        # user 1: three events in one session (exact-timeout gap included)
        {"event_id": 1, "user_id": 1, "ts": base, "event_type": "a"},
        {"event_id": 2, "user_id": 1, "ts": base + pd.Timedelta(seconds=1800), "event_type": "b"},
        {"event_id": 3, "user_id": 1, "ts": base + pd.Timedelta(seconds=1900), "event_type": "a"},
        # then a strict break
        {"event_id": 4, "user_id": 1, "ts": base + pd.Timedelta(seconds=3701), "event_type": "c"},
        # user 2: duplicate timestamps, single session
        {"event_id": 6, "user_id": 2, "ts": base, "event_type": "a"},
        {"event_id": 5, "user_id": 2, "ts": base, "event_type": "b"},
    ]
    ev = spark.createDataFrame(pd.DataFrame(rows))
    s = {(r.event_id): r.session_idx for r in sessionize(ev).collect()}
    assert s == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0, 6: 0}

    st = {(r.user_id, r.session_idx): r for r in session_stats(ev).collect()}
    r10 = st[(1, 0)]
    assert r10.n_events == 3 and r10.n_event_types == 2 and r10.duration_s == 1900.0
    assert st[(1, 1)].n_events == 1 and st[(1, 1)].duration_s == 0.0
    assert st[(2, 0)].n_events == 2 and st[(2, 0)].n_event_types == 2
