"""Registry + driver-contract invariants."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_inventory_size(registry):
    oracle = [q for q in registry.values() if q.oracle]
    assert len(registry) >= 95, "SURVEY §2 declares 95 query ids"
    assert len(oracle) >= 83, "SURVEY §2 declares 83 oracle-tier ids"


def test_every_query_has_category_and_doc(registry):
    for q in registry.values():
        assert q.category in set("ABCDEFGHIJKL"), q.name
        assert q.doc, f"{q.name} missing doc"


def test_driver_contract_shape():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in osql.values())


def test_driver_queue_rotates(registry, tmp_path):
    """Round-2 verdict item 1: the verified set must derive from the
    CORRECTNESS_r*.json files on disk; while unverified ids remain, the
    next round's ~50-slot prefix must contain zero already-verified ids,
    with every never-verified SURVEY §2 id (oracle AND rows tier) ahead
    of extras. Round-9 verdict item 1: once the drain completes
    (done == registry, true from CORRECTNESS_r09 onward) that no-overlap
    invariant is unsatisfiable — the terminal-state contract is instead
    STALENESS-FIRST re-rotation: the verified block is ordered by each
    id's latest green driver round (oldest first), so the prefix
    refreshes the stalest rows instead of wasting slots on registration
    order."""
    import json

    import __spark_entry__ as entry_mod
    from big_data_management_and_analytics_spark.plans.driver_history import (
        VERIFIED_R01,
        driver_rounds,
        driver_verified,
        queue_order,
    )

    # Dynamic set = union of the real files' keys (round 1 + round 2 here).
    done = driver_verified()
    assert VERIFIED_R01 <= done, "round-1 keys must stay verified"
    assert len(done) > len(VERIFIED_R01), "round-2 keys must be unioned in"

    survey = entry_mod._survey_ids()
    order = queue_order(registry, survey, verified=done)
    prefix = set(order[:50])
    if len(done & set(registry)) < len(registry):
        assert not (prefix & done), "prefix re-verifies already-green ids"
        unverified_survey = {n for n in survey if n in registry and n not in done}
        assert unverified_survey <= prefix or len(unverified_survey) > 50, (
            "all never-verified SURVEY §2 ids must enqueue before extras"
        )
    else:
        # Terminal state: every slot is a re-verification; the real
        # queue (tier-aware staleness from the CORRECTNESS files) must
        # be non-decreasing in per-id latest-green round, so the prefix
        # is exactly the stalest rows.
        latest_hash, latest_any = driver_rounds()
        real_order = queue_order(registry, survey)

        from big_data_management_and_analytics_spark.plans.driver_history import (
            reverify_staleness,
        )

        def tier_round(n: str) -> int:
            # Effective staleness: REVERIFY_FIRST ids whose code changed
            # after their newest green round front the verified block
            # (VERDICT r11 item 6) — same rule queue_order applies.
            m = latest_hash if registry[n].oracle else latest_any
            return reverify_staleness(n, m.get(n, 0))

        rounds_in_order = [tier_round(n) for n in real_order]
        assert rounds_in_order == sorted(rounds_in_order), (
            "terminal-state queue must be ordered by driver-row staleness"
        )
        # Multiset compare (ADVICE r10): a SET of rounds would let a
        # prefix of 1 r02 + 49 r03 pass against a stalest block of
        # 49 r02 + 1 r03 — per-round COUNTS must match too.
        from collections import Counter

        stalest = sorted(registry, key=lambda n: tier_round(n))[:50]
        assert Counter(tier_round(n) for n in real_order[:50]) == Counter(
            tier_round(n) for n in stalest
        ), "prefix must hold the oldest latest-green rounds"

        # Keep the pre-drain no-overlap invariant itself under test on
        # terminal trees: with a synthetically reduced verified set the
        # prefix must again contain zero verified ids, unverified §2/
        # llm/mm blocks ahead of everything verified.
        partial = frozenset(
            n for n in done if not n.startswith(("llm_", "mm_"))
        )
        syn_prefix = set(queue_order(registry, survey, verified=partial)[:50])
        assert not (syn_prefix & partial), (
            "pre-drain prefix re-verifies already-green ids"
        )

    # Round-5 verdict item 1: the mandated LLM/multimodal family is the
    # highest-priority extras block — never-verified llm_*/mm_* ids must
    # all rank before any never-verified generic extra.
    kfam = {
        n for n in registry
        if n.startswith(("llm_", "mm_")) and n not in done and n not in survey
    }
    other = {
        n for n in registry
        if not n.startswith(("llm_", "mm_"))
        and n not in done and n not in survey
    }
    if kfam and other:
        pos = {n: i for i, n in enumerate(order)}
        assert max(pos[n] for n in kfam) < min(pos[n] for n in other), (
            "never-verified llm_*/mm_* ids must outrank generic extras"
        )

    # Tier-awareness: an oracle-tier id whose only driver record was a
    # rows-only check (err: no_oracle) must RE-queue for the hash check.
    from big_data_management_and_analytics_spark.plans.driver_history import (
        driver_history,
    )

    hash_green, any_green = driver_history()
    upgraded = [
        n
        for n in any_green - hash_green
        if n in registry and registry[n].oracle
    ]
    if upgraded:
        real_order = queue_order(registry, survey)
        # Every re-queued id must rank before every already-at-tier
        # verified id (it may still fall past slot 50 behind other
        # unverified ids — that only delays it one round).
        first_verified_pos = min(
            real_order.index(n)
            for n in real_order
            if (n in hash_green if registry[n].oracle else n in any_green)
        )
        late = [n for n in upgraded if real_order.index(n) > first_verified_pos]
        assert not late, f"tier-upgraded ids rank behind verified ids: {late}"

    # Fallback: with no readable CORRECTNESS files, use the r01 snapshot.
    assert driver_verified(repo_root=tmp_path) == VERIFIED_R01
    # A synthetic round file in an empty root is picked up dynamically.
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({"some_id": {"rows_match": True}})
    )
    assert driver_verified(repo_root=tmp_path) == frozenset({"some_id"})

    # Staleness bookkeeping: latest round per id comes from the FILE
    # NAME (r0*N), tracked separately per tier — a hash-green record
    # advances latest_hash, a rows-only record only latest_any, and the
    # max round wins when an id appears in several files.
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps(
            {
                "some_id": {"rows_match": True, "hash_match": True},
                "other_id": {"rows_match": True},
            }
        )
    )
    lh, la = driver_rounds(repo_root=tmp_path)
    assert la == {"some_id": 10, "other_id": 10}
    assert lh == {"some_id": 10}  # r09's rows-only row never set a hash round


def test_reverify_first_fronts_changed_ids(registry, tmp_path):
    """VERDICT r11 item 6: ids whose implementation changed after their
    newest driver-green round (REVERIFY_FIRST) must lead the verified
    block so the driver oracle re-confirms the new code next rotation —
    and the fronting must auto-expire once a CORRECTNESS round at/after
    the change round records them green."""
    import json

    import __spark_entry__ as entry_mod
    from big_data_management_and_analytics_spark.plans.driver_history import (
        REVERIFY_FIRST,
        driver_rounds,
        queue_order,
        reverify_staleness,
    )

    survey = entry_mod._survey_ids()
    latest_hash, latest_any = driver_rounds()

    def tier_round(n: str) -> int:
        m = latest_hash if registry[n].oracle else latest_any
        return m.get(n, 0)

    pending = [
        n
        for n, changed in REVERIFY_FIRST.items()
        if n in registry and tier_round(n) < changed
    ]
    if pending:
        order = queue_order(registry, survey)
        pos = {n: i for i, n in enumerate(order)}
        # Every pending re-verify id must rank before every ordinary
        # verified id (they may still trail never-verified ids, which
        # outrank the whole verified block by prio).
        ordinary = [
            n
            for n in order
            if n not in REVERIFY_FIRST
            and tier_round(n) > 0  # verified at its tier at least once
        ]
        first_ordinary = min(pos[n] for n in ordinary)
        late = [n for n in pending if pos[n] > first_ordinary]
        assert not late, f"re-verify ids rank behind verified ids: {late}"

    # Auto-expiry: a green record at/after the change round restores
    # plain staleness (no negative offset). Derive from the live map so
    # the test survives change-round bumps.
    some_id, changed = next(iter(REVERIFY_FIRST.items()))
    assert reverify_staleness(some_id, changed - 1) < 0
    assert reverify_staleness(some_id, changed) == changed
    assert reverify_staleness(some_id, changed + 1) == changed + 1
    assert reverify_staleness("not_a_tracked_id", 3) == 3


def test_red_driver_rows_requeue(registry, tmp_path):
    """VERDICT r10 item 1: a CORRECTNESS record with a non-null hard
    ``err`` (or a 0-row rows-tier record) must count as verified for
    NEITHER tier and must never advance the staleness maps. Two
    consequences pinned here: an id whose only driver row is red
    re-queues as unverified at the FRONT of the next prefix, and an id
    with an older green keeps the OLD round (a red row refreshing
    staleness to the failing round would sink the failure to the back
    of the ~9-round rotation — the exact inversion the fix prevents)."""
    import json

    import __spark_entry__ as entry_mod
    from big_data_management_and_analytics_spark.plans.driver_history import (
        driver_rounds,
        driver_verified,
        queue_order,
    )

    survey = entry_mod._survey_ids()
    oracle_victim = "tpch_q3_shipping"  # §2 oracle-tier
    rows_victim = next(n for n in registry if registry[n].oracle is None)
    victims = {oracle_victim, rows_victim}
    assert registry[oracle_victim].oracle is not None

    def green(n: str) -> dict:
        if registry[n].oracle is not None:
            return {
                "rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 3, "oracle_rows": 3,
                "err": None,
            }
        return {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": 3, "oracle_rows": None, "err": "no_oracle",
        }

    red = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None,
        "err": "Traceback: synthetic driver crash",
    }

    # r01 greens everything except the victims; r02 records both victims
    # RED (one per tier).
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: green(n) for n in registry if n not in victims})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({n: red for n in victims})
    )

    lh, la = driver_rounds(repo_root=tmp_path)
    assert victims.isdisjoint(la) and victims.isdisjoint(lh), (
        "red rows must not count toward either latest map"
    )
    assert victims.isdisjoint(driver_verified(repo_root=tmp_path))

    # Both failed ids front the next prefix (the only unverified ids;
    # the §2 oracle-tier victim outranks everything at prio 0).
    order = queue_order(registry, survey, repo_root=tmp_path)
    assert order[0] == oracle_victim
    assert set(order[:2]) == victims, "red-rowed ids must front the prefix"

    # Old green + newer red: the latest-green round stays at the green
    # round — the red r04 must not refresh staleness to 4.
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({n: green(n) for n in victims})
    )
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({n: red for n in victims})
    )
    lh, la = driver_rounds(repo_root=tmp_path)
    assert la[oracle_victim] == 3 and la[rows_victim] == 3
    assert lh[oracle_victim] == 3

    # A rows-tier record that errored into 0 rows is not green either.
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"zz_empty": {"err": "no_oracle", "spark_rows": 0}})
    )
    _, la = driver_rounds(repo_root=tmp_path)
    assert "zz_empty" not in la


def test_entry_runs(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_all_queries_run_smoke(spark, registry):
    """Every registered callable executes at sf0.001 and yields a schema."""
    slow = {"stream_output_modes"}  # exercised in test_operators.py::test_stream_output_modes_ordering_invariants
    for name, q in sorted(registry.items()):
        if name in slow:
            continue
        df = q.fn(spark, SF_SMALL)
        assert df.columns, name
        assert df.count() >= 0, name


def test_oracle_tier_outputs_are_driver_hashable(spark, registry):
    """No oracle-tier query may emit an array/map/struct output column.

    The driver's canonicalizer sorts raw pandas columns and crashes on
    unhashable cells (CORRECTNESS_r07: ``events_feature_vector``,
    ``TypeError: unhashable type: 'numpy.ndarray'`` — the first driver
    failure since r1, and the local harness serialized the array so
    428/428 passed locally). SURVEY §2.0 amendment 11 already mandates
    concat_ws serialization for collected lists; this pins it registry-
    wide at the schema level. Plan-build only — no execution."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, q in sorted(registry.items()):
        if q.oracle is None:
            continue  # rows-tier: driver only counts rows, never hashes
        schema = q.fn(spark, SF_SMALL).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "oracle-tier queries with driver-undeliverable complex-typed "
        f"output columns: {offenders}"
    )


def test_hostile_session_confs_are_overridden(spark, registry):
    """The driver contract hands us a session we don't build: even if it
    arrives with inferTimestampNTZ on and a non-UTC timezone, tune()
    (invoked by every load()) must re-pin the runtime confs so results
    are unchanged (the verify-skill probe, as a suite guard)."""
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")
    n = registry["scan_pushdown_filter"].fn(hostile, "/root/testdata/sf0.01").count()
    assert n == 12383
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"
    assert (
        hostile.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
    )
    # timestamp semantics survive too: hourly bucketing in the hostile
    # session matches the canonical session bit-for-bit.
    a = sorted(
        map(tuple, registry["ts_ohlc_resample"].fn(hostile, "/root/testdata/sf0.001").collect())
    )
    b = sorted(
        map(tuple, registry["ts_ohlc_resample"].fn(spark, "/root/testdata/sf0.001").collect())
    )
    assert a == b


def test_minhash_geometry_invariants():
    """The constants every hash-verified LSH consumer leans on:

    - N_HASHES divides evenly into BAND_SIZE-row bands (a ragged tail
      band would silently band fewer rows than declared);
    - the universal-hash prime P stays below 2^31, which is what makes
      the packed-long band keys (s_hi * 2^31 + s_lo) BIJECTIVE — the
      whole oracle-tier claim that Spark's long-tuple buckets group the
      same docs as DuckDB's string-tuple buckets rests on this;
    - the tuning audit sweeps only exact factorizations of N_HASHES and
      includes the production geometry, so llm_lsh_tuning always reports
      the config llm_dedup_minhash actually ships.
    """
    from big_data_management_and_analytics_spark.functions.llm_dedup import (
        BAND_SIZE,
        N_HASHES,
        TUNING_BANDS,
    )
    from big_data_management_and_analytics_spark.functions.portable_hash import P

    assert N_HASHES % BAND_SIZE == 0
    assert 0 < P < (1 << 31)
    for bands in TUNING_BANDS:
        assert N_HASHES % bands == 0, bands
    assert (N_HASHES // BAND_SIZE) in TUNING_BANDS
