"""Engine benchmark. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "cdc_events_per_sec": <headline throughput>, ...}

Default: runs the headline CDC apply (deterministic generated
transcript events, batched through the full validate→collapse→MERGE
path into a lake table) plus representative operator queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

``--scaling``: runs the identical CDC apply (same pre-generated input
files) at two parallelism levels (default 8 and 32 cores) and writes
BENCH/BASELINE.md with both throughputs and the scaling efficiency
(BASELINE.json criterion: efficiency >= 0.8 from N to 4N).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: events for the headline CDC apply, proportional to sf
EVENTS_PER_SF = 40_000_000  # sf0.1 -> 4M events

QUERY_NAMES = [
    "cdc_last_event_per_key",
    "cdc_lineage_agg",
    "cdc_time_range_scan",
    "cdc_cascade_view",
    "cdc_agg_view",
    "cdc_bloom_point_lookup",
    "events_sessionize",
    "events_assemble_transcripts",
    "doc_quality_score",
    "doc_train_val_split",
    "doc_pack_chunks",
    "doc_stratified_sample",
    "doc_contamination_check",
    "doc_minhash_lsh_pairs",
    "doc_dedup_incremental",
    "doc_line_dedup",
    "emb_dedup_incremental",
    "doc_simhash_dups",
    "doc_dup_clusters",
    "emb_dup_clusters",
    "emb_knn_bruteforce",
    "emb_ivf_ann",
    "dup_signal_agreement",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_semi_join",
    "tpch_q5_local_supplier_volume",
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def gen_input(spark, n_events: int, out_dir: str, partitions: int) -> None:
    """One-time, untimed: deterministic transcript CDC events to
    parquet (the 'Kafka topic contents' the timed job replays)."""
    from kafka_jdbc_sink_connector_spark.datagen import (
        GenSpec,
        generate_cdc_events,
    )

    spec = GenSpec(
        n_events=n_events,
        n_conversations=max(1000, n_events // 100),
        turns_per_conversation=20,
        n_partitions=32,
        delete_fraction=0.01,
    )
    df = generate_cdc_events(spark, spec, partitions=partitions)
    df.write.mode("overwrite").parquet(out_dir)


def run_cdc_apply(spark, input_dir: str, table_dir: str, n_batches: int,
                  n_buckets: int, merge_mode: str = "cow") -> dict:
    from pyspark.sql import functions as F

    from kafka_jdbc_sink_connector_spark.apply import CdcApplier
    from kafka_jdbc_sink_connector_spark.config import SinkConfig

    events = spark.read.parquet(input_dir)
    lo = events.agg(F.min("kafka_offset"), F.max("kafka_offset")).collect()[0]
    mn, mx = lo[0], lo[1] + 1
    n_events = events.count()

    cfg = SinkConfig(n_buckets=n_buckets, merge_mode=merge_mode)
    applier = CdcApplier(spark, cfg, table_dir)
    t0 = time.monotonic()
    for i in range(n_batches):
        blo = mn + (mx - mn) * i // n_batches
        bhi = mn + (mx - mn) * (i + 1) // n_batches
        b = events.filter(
            (F.col("kafka_offset") >= blo) & (F.col("kafka_offset") < bhi)
        )
        applier.apply_batch(b, batch_id=i)
    dt = time.monotonic() - t0
    final_rows = applier.read_target().count()
    return {
        "seconds": dt,
        "n_events": n_events,
        "events_per_sec": n_events / dt,
        "final_rows": final_rows,
        "n_batches": n_batches,
    }


def run_write_amp(spark, input_dir: str, work: str,
                  n_buckets: int) -> dict:
    """Steady-state write amplification: bootstrap half the stream,
    then 6 small batches (~2% each) in COW vs MOR; report bytes
    written per steady batch and throughput for both modes. This is
    the 100 TB shape — micro-batches tiny relative to the table —
    where copy-on-write rewrites nearly every bucket every batch."""
    from pyspark.sql import functions as F

    from kafka_jdbc_sink_connector_spark.apply import CdcApplier
    from kafka_jdbc_sink_connector_spark.config import SinkConfig

    def data_bytes(path: str) -> int:
        total = 0
        for dirpath, _d, files in os.walk(os.path.join(path, "data")):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(dirpath, f))
        return total

    events = spark.read.parquet(input_dir)
    lo = events.agg(F.min("kafka_offset"), F.max("kafka_offset")).collect()[0]
    mn, mx = lo[0], lo[1] + 1
    span = mx - mn
    half = mn + span // 2
    # steady batches are 0.5% of the stream each — the 100 TB shape
    # (micro-batch << table); bigger fractions understate the COW
    # rewrite penalty
    step = max(1, span // 200)
    out = {}
    checksums = {}
    for mode in ("cow", "mor"):
        table_dir = os.path.join(work, f"wa_{mode}")
        applier = CdcApplier(
            spark, SinkConfig(n_buckets=n_buckets, merge_mode=mode),
            table_dir,
        )
        applier.apply_batch(
            events.filter(F.col("kafka_offset") < half), batch_id=0
        )
        base = data_bytes(table_dir)
        t0 = time.monotonic()
        n_steady = 6
        for i in range(n_steady):
            blo = half + i * step
            b = events.filter(
                (F.col("kafka_offset") >= blo)
                & (F.col("kafka_offset") < blo + step)
            )
            applier.apply_batch(b, batch_id=i + 1)
        dt = time.monotonic() - t0
        out[mode] = {
            "bytes_per_batch": (data_bytes(table_dir) - base) // n_steady,
            "steady_sec": round(dt, 3),
            "steady_events_per_sec": round(n_steady * step / dt, 1),
        }
        # order-insensitive state checksum (audit_ts excluded: it is
        # the apply-time clock, legitimately different per run)
        tgt = applier.read_target().drop("audit_ts")
        checksums[mode] = tgt.agg(
            F.sum(
                F.xxhash64(*sorted(tgt.columns)).cast("decimal(38,0)")
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
    out["write_amp_reduction"] = round(
        out["cow"]["bytes_per_batch"]
        / max(1, out["mor"]["bytes_per_batch"]), 1
    )
    # the two modes must agree row-for-row at bench scale
    out["state_match"] = (
        checksums["cow"]["h"] == checksums["mor"]["h"]
        and checksums["cow"]["n"] == checksums["mor"]["n"]
    )
    out["final_rows"] = int(checksums["cow"]["n"])
    return out


def main_cadence(args) -> None:
    """Compaction-cadence sweep: the knob a 100 TB MOR operator tunes.

    For each ``mor_compact_every_batches`` value, bootstrap half the
    stream and apply 12 steady batches (0.5% each) through the stream
    runner's in-band compaction, then report the trade the cadence
    buys: bytes written per steady batch (write amp, compaction
    rewrites included), steady apply throughput, delta files left at
    the end, and cold full-read latency (read amp). Never-compact
    minimizes writes but accumulates deltas the read must fold; every-
    batch compaction is COW in disguise. Prints one JSON line with the
    measured points (pasted into SCALE.md)."""
    from pyspark.sql import functions as F

    from kafka_jdbc_sink_connector_spark.apply import CdcApplier
    from kafka_jdbc_sink_connector_spark.config import SinkConfig
    from kafka_jdbc_sink_connector_spark.streaming.runner import (
        CdcStreamRunner,
    )

    def data_bytes(path: str) -> int:
        total = 0
        for dirpath, _d, files in os.walk(os.path.join(path, "data")):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(dirpath, f))
        return total

    spark = build(args.cpus)
    work = tempfile.mkdtemp(prefix="bench_cadence_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    points = []
    try:
        n_events = args.events or 2_000_000
        input_dir = args.input_dir or os.path.join(work, "input")
        if not args.input_dir:
            gen_input(spark, n_events, input_dir,
                      int(args.cpus) * 2 if args.cpus.isdigit() else 64)
        events = spark.read.parquet(input_dir)
        lo = events.agg(
            F.min("kafka_offset"), F.max("kafka_offset")
        ).collect()[0]
        mn, mx = lo[0], lo[1] + 1
        span, half = mx - mn, mn + (mx - mn) // 2
        step = max(1, span // 200)
        n_steady = 12
        for cadence in (None, 6, 3, 1):
            table_dir = os.path.join(work, f"cad_{cadence}")
            cfg = SinkConfig(n_buckets=args.buckets, merge_mode="mor",
                             mor_compact_every_batches=cadence)
            runner = CdcStreamRunner(
                CdcApplier(spark, cfg, table_dir),
                checkpoint_dir=os.path.join(table_dir, "_ckpt"),
            )
            runner.process_batch(
                events.filter(F.col("kafka_offset") < half), 0
            )
            base = data_bytes(table_dir)
            t0 = time.monotonic()
            for i in range(n_steady):
                blo = half + i * step
                runner.process_batch(
                    events.filter(
                        (F.col("kafka_offset") >= blo)
                        & (F.col("kafka_offset") < blo + step)
                    ),
                    i + 1,
                )
            apply_sec = time.monotonic() - t0
            snap = runner.applier.table().snapshot
            t0 = time.monotonic()
            rows = runner.applier.read_target().count()
            read_sec = time.monotonic() - t0
            points.append({
                "compact_every": cadence,
                "bytes_per_batch": (data_bytes(table_dir) - base)
                // n_steady,
                "steady_events_per_sec": round(
                    n_steady * step / apply_sec, 1
                ),
                "delta_files_at_end": len(snap.delta_files())
                + len(snap.sdel_files()),
                "full_read_sec": round(read_sec, 3),
                "rows": rows,
            })
            print(json.dumps(points[-1]), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps({
        "metric": "mor compaction-cadence sweep",
        "unit": "mixed",
        "value": len(points),
        "n_steady_batches": n_steady,
        "points": points,
        "cpus": args.cpus,
    }))


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    out = {}
    for name in QUERY_NAMES:
        t0 = time.monotonic()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def build(cores: str):
    from kafka_jdbc_sink_connector_spark.session import build_session

    n = int(cores) if cores.isdigit() else 32
    return build_session(
        app_name="bench",
        cores=cores,
        shuffle_partitions=n * 2,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g"),
            # keep scan tasks >= cores even on modest inputs, so the
            # map-side (scan + partial collapse) saturates the executor.
            # NOTE heap deliberately modest: a 48g heap measured 4x
            # SLOWER than 16g here (long allocation stalls on the
            # sandbox's VM - fresh-page zeroing + G1 region work),
            # with CPU idle; 16g keeps GC pauses <200ms
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            # the sandbox's single virtio disk is the bottleneck (high
            # loadavg at ~idle CPU = D-state I/O); shuffle through
            # tmpfs so the bench measures the engine, not one shared
            # disk. A real cluster has per-node NVMe for exactly this.
            "spark.local.dir": _tmpfs_dir("spark-local"),
            **json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}")),
        },
    )


def _tmpfs_dir(name: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    d = os.path.join(base, f"bench-{name}-{os.getpid()}")
    os.makedirs(d, exist_ok=True)
    return d


def wait_calm(args) -> float:
    """Block until the host looks calm (loadavg + a 5 s steal sample)
    or ``--calm-wait-max`` elapses; returns the loadavg that ended the
    wait. Gating uses host signals only, never throughput, so it
    cannot bias the numbers — the same pre-registered protocol the
    scaling run uses."""
    deadline = time.monotonic() + args.calm_wait_max
    while True:
        time.sleep(args.settle_sec)
        load = _loadavg()
        s0, t0 = _cpu_stat()
        time.sleep(5)
        s1, t1 = _cpu_stat()
        steal_now = 100.0 * (s1 - s0) / max(1, t1 - t0)
        if load <= args.max_load and steal_now <= args.max_steal_pct:
            return load
        if time.monotonic() >= deadline:
            return load  # proceed; the validity fields will flag it


def main_default(args) -> None:
    sf = sf_of(args.sf_dir)
    n_events = args.events or max(20_000, int(EVENTS_PER_SF * sf))
    # host-validity instrumentation: the sandbox host varies up to 3x
    # between identical runs (shared VM, bursty co-tenants), so every
    # emitted JSON carries the signals needed to tell a real
    # regression from a noisy host — pre-run loadavg, hypervisor
    # steal% measured over the whole run, and a host_valid verdict
    # against the same pre-registered thresholds the scaling protocol
    # uses. Default: wait (bounded) for a calm window first.
    load0 = _loadavg() if args.no_wait_calm else wait_calm(args)
    steal0, total0 = _cpu_stat()
    spark = build(args.cpus)
    work = tempfile.mkdtemp(prefix="bench_cdc_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    try:
        if args.input_dir:
            input_dir = args.input_dir
        else:
            input_dir = os.path.join(work, "input")
            gen_input(spark, n_events, input_dir,
                      int(args.cpus) * 2 if args.cpus.isdigit() else 64)
        cdc = run_cdc_apply(
            spark, input_dir, os.path.join(work, "tgt"),
            n_batches=args.batches, n_buckets=args.buckets,
            merge_mode=args.merge_mode,
        )
        wa = (
            {} if args.skip_write_amp
            else run_write_amp(spark, input_dir, work, args.buckets)
        )
        queries = {} if args.skip_queries else run_queries(spark, args.sf_dir)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    steal1, total1 = _cpu_stat()
    steal_pct = round(100.0 * (steal1 - steal0) / max(1, total1 - total0), 2)
    wa_sec = sum(wa[m]["steady_sec"] for m in ("cow", "mor")) if wa else 0
    total = round(cdc["seconds"] + sum(queries.values()) + wa_sec, 3)
    queries = {"cdc_apply": round(cdc["seconds"], 3), **queries}
    if wa:
        queries["mor_steady_apply"] = wa["mor"]["steady_sec"]
        queries["cow_steady_apply"] = wa["cow"]["steady_sec"]
    payload = {
        "loadavg_at_start": load0,
        "steal_pct": steal_pct,
        "host_valid": bool(
            steal_pct <= args.max_steal_pct and load0 <= args.max_load
        ),
        "metric": "cdc-apply+operator suite wall seconds "
                  "(headline: change-events/sec end-to-end)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cdc_events_per_sec": round(cdc["events_per_sec"], 1),
        "cdc_n_events": cdc["n_events"],
        "cdc_final_rows": cdc["final_rows"],
        "cpus": args.cpus,
        "merge_mode": args.merge_mode,
    }
    if wa:
        payload["mor_state_matches_cow"] = wa["state_match"]
        payload["mor_write_bytes_per_batch"] = wa["mor"]["bytes_per_batch"]
        payload["cow_write_bytes_per_batch"] = wa["cow"]["bytes_per_batch"]
        payload["mor_write_amp_reduction"] = wa["write_amp_reduction"]
        payload["mor_steady_events_per_sec"] = (
            wa["mor"]["steady_events_per_sec"]
        )
        payload["cow_steady_events_per_sec"] = (
            wa["cow"]["steady_events_per_sec"]
        )
    print(json.dumps(payload))


def _cpu_stat() -> tuple[int, int]:
    """(steal jiffies, total jiffies) from /proc/stat's cpu line."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _loadavg() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def _pinned_run(args, cores: int, n_events: int, gen_dir: str) -> dict:
    """One calm-gated bench child pinned to exactly ``cores`` CPUs
    with `taskset`, over the shared pre-generated input. Returns the
    child's JSON result annotated with the parent-measured validity
    fields (pre-run loadavg, steal% over the run). Shared by the
    paired-median scaling protocol and the single-run ladder so the
    two modes cannot drift apart.

    The child runs with --no-wait-calm: the parent gates calmness
    right here; the child gating too would double the settle and skew
    pairing."""
    here = os.path.abspath(__file__)
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    cmd = [sys.executable, here, "--sf-dir", args.sf_dir,
           "--events", str(n_events), "--batches", str(args.batches),
           "--buckets", str(args.buckets), "--input-dir", gen_dir,
           "--skip-queries", "--skip-write-amp", "--no-wait-calm"]
    if shutil.which("taskset") is not None:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    load0 = wait_calm(args)
    s0, t0 = _cpu_stat()
    out = subprocess.run(cmd, env=env, capture_output=True,
                         text=True, check=True)
    s1, t1 = _cpu_stat()
    json_lines = [l for l in out.stdout.splitlines()
                  if l.startswith("{")]
    if not json_lines:
        raise RuntimeError(
            f"bench child (cores={cores}) printed no JSON result; "
            f"stderr tail: {out.stderr[-500:]}"
        )
    r = json.loads(json_lines[-1])
    r["loadavg_at_start"] = load0
    r["steal_pct"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
    return r


def main_scaling(args) -> None:
    """Same job + same pre-generated input files at N and 4N cores —
    the paired-median protocol.

    The sandbox is a shared VM with bursty co-tenants (steal time up
    to ~8%, loadavg spikes from outside the container), so single runs
    vary up to 3x. The protocol controls for that WITHOUT manual
    curation:

    * each *pair* is a low-core and a high-core run back-to-back (so
      host drift hits both sides of one ratio alike), each in a fresh
      subprocess pinned to exactly its core budget with `taskset`;
    * before every run the protocol WAITS for a calm window: sleep
      --settle-sec (lets our own previous run drain out of loadavg),
      then sample loadavg and instantaneous steal; retry until calm or
      --calm-wait-max elapses. Gating uses host signals only, never
      throughput — so it cannot bias the ratio;
    * per run, hypervisor steal time (from /proc/stat, measured over
      the run) and pre-run loadavg are recorded; a pair is VALID only
      if both runs saw steal <= --max-steal-pct and started at
      loadavg <= --max-load (objective, pre-registered thresholds —
      no after-the-fact picking);
    * pairs repeat until --min-valid-pairs are valid or --max-pairs
      have run (a stopping rule on *validity*, which is independent of
      the measured efficiencies);
    * the reported efficiency is the MEDIAN of valid pairs' ratios;
      every pair (valid or not) is listed in the evidence doc.
    """
    here = os.path.abspath(__file__)
    n_events = args.events or 64_000_000
    lo, hi = args.scale_low, args.scale_high
    gen_dir = _tmpfs_dir("scaling-input")
    gen_spark = build(str(os.cpu_count() or 32))
    try:
        gen_input(gen_spark, n_events, gen_dir, 128)
    finally:
        gen_spark.stop()

    pairs: list[dict] = []
    try:
        while len(pairs) < args.max_pairs:
            r_lo = _pinned_run(args, lo, n_events, gen_dir)
            r_hi = _pinned_run(args, hi, n_events, gen_dir)
            eff = (
                r_hi["cdc_events_per_sec"] / r_lo["cdc_events_per_sec"]
            ) / (hi / lo)
            valid = all(
                r["steal_pct"] <= args.max_steal_pct
                and r["loadavg_at_start"] <= args.max_load
                for r in (r_lo, r_hi)
            )
            pairs.append({"lo": r_lo, "hi": r_hi,
                          "eff": round(eff, 3), "valid": valid})
            if sum(p["valid"] for p in pairs) >= args.min_valid_pairs:
                break
    finally:
        shutil.rmtree(gen_dir, ignore_errors=True)

    valid_effs = sorted(p["eff"] for p in pairs if p["valid"])
    all_effs = sorted(p["eff"] for p in pairs)
    use = valid_effs or all_effs
    median_eff = use[len(use) // 2] if len(use) % 2 else (
        (use[len(use) // 2 - 1] + use[len(use) // 2]) / 2
    )
    best_lo = max((p["lo"] for p in pairs),
                  key=lambda r: r["cdc_events_per_sec"])
    best_hi = max((p["hi"] for p in pairs),
                  key=lambda r: r["cdc_events_per_sec"])

    pair_rows = "\n".join(
        f"| {i + 1} | {p['lo']['cdc_events_per_sec']:,.0f} "
        f"(steal {p['lo']['steal_pct']}%, load "
        f"{p['lo']['loadavg_at_start']}) | "
        f"{p['hi']['cdc_events_per_sec']:,.0f} "
        f"(steal {p['hi']['steal_pct']}%, load "
        f"{p['hi']['loadavg_at_start']}) | {p['eff']:.3f} | "
        f"{'yes' if p['valid'] else 'NO'} |"
        for i, p in enumerate(pairs)
    )
    md = f"""# BENCH/BASELINE.md — throughput + two-cluster-size scaling evidence

Target (BASELINE.json): change-events/sec end-to-end (source offset ->
committed snapshot); **scaling efficiency >= 0.8 from N to
{hi // lo}N parallelism** evidenced by the same job on the same input
at two pinned core budgets (no real cluster in this sandbox).

## Job under test

Headline CDC apply (`bench.py`): {n_events:,} deterministic seeded
transcript change events (Zipf conversations, 1% deletes, 20% updates,
duplicate redeliveries), replayed in {args.batches} micro-batches
through the full path — validate/quarantine -> last-writer-wins
collapse (max_by, map-side combine) -> full-outer MERGE with soft
deletes + audit ts -> atomic snapshot commit + lineage — into a
{args.buckets}-bucket lake table. The input parquet is generated ONCE
and shared; each run is a fresh subprocess pinned to exactly its core
budget with `taskset` (an unpinned local[N] JVM leaks GC/IO/codegen
threads onto other cores, inflating small-N throughput); shuffle +
data on tmpfs (the sandbox's single virtio disk would otherwise
serialize both runs — a real cluster has per-node disks).

## Paired-median protocol (no manual curation)

Each pair = one local[{lo}] run and one local[{hi}] run back-to-back,
so host drift hits both sides of a ratio alike. Before every run the
protocol waits for a calm window ({args.settle_sec}s settle + loadavg
/5s-steal probe, capped at {args.calm_wait_max}s) — gating on host
signals only, never on throughput, so it cannot bias the ratio.
Validity is decided by pre-registered thresholds recorded per run —
hypervisor steal time <= {args.max_steal_pct}% over the run
(/proc/stat) and pre-run loadavg <= {args.max_load} — and pairs
repeat until {args.min_valid_pairs} are valid (or {args.max_pairs}
attempted; the stopping rule sees validity only, which is independent
of the measured efficiencies). Reported efficiency = median over
valid pairs; every pair is listed.

| pair | local[{lo}] ev/s | local[{hi}] ev/s | efficiency | valid |
|---|---|---|---|---|
{pair_rows}

**Median scaling efficiency ({lo} -> {hi} cores): {median_eff:.3f}**
({len(valid_effs)}/{len(pairs)} pairs valid{'' if valid_effs else ' — NONE valid, median over all pairs shown'})

## Best observed throughput (this protocol run)

| cores | wall sec | events/sec |
|---|---|---|
| local[{lo}] | {best_lo['queries']['cdc_apply']} | {best_lo['cdc_events_per_sec']:,.0f} |
| local[{hi}] | {best_hi['queries']['cdc_apply']} | {best_hi['cdc_events_per_sec']:,.0f} |

(The reference connector publishes no numbers — SURVEY.md §6; its
row-at-a-time JDBC executeBatch path is architecturally bounded well
below these figures on any single node.)

## Reproduce

```
python bench.py                       # JSON line, sf0.1 defaults
python bench.py --scaling --scale-low {lo} --scale-high {hi} \\
    --events {n_events} --batches {args.batches} \\
    --min-valid-pairs {args.min_valid_pairs} --max-pairs {args.max_pairs}
```
"""
    bench_dir = os.path.join(os.path.dirname(here), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    baseline_path = os.path.join(bench_dir, "BASELINE.md")
    if args.scaling_append and os.path.exists(baseline_path):
        # SECOND-SPAN mode: the committed first-span evidence stays —
        # rerunning and replacing it wholesale (then keeping whichever
        # run looked better) would be exactly the curation the
        # protocol forbids. Appended spans use the same pre-registered
        # thresholds and stopping rule.
        section = f"""

## Second span: {lo} -> {hi} cores ({n_events:,} events, same protocol)

Same job, same paired-median calm-window protocol and pre-registered
validity thresholds (steal <= {args.max_steal_pct}%, pre-run loadavg
<= {args.max_load}) as the first span above — appended, not
replacing, so the committed first-span evidence stands. Two spans
show the efficiency is not a small-N artifact.

| pair | local[{lo}] ev/s | local[{hi}] ev/s | efficiency | valid |
|---|---|---|---|---|
{pair_rows}

**Median scaling efficiency ({lo} -> {hi} cores): {median_eff:.3f}**
({len(valid_effs)}/{len(pairs)} pairs valid{'' if valid_effs else ' — NONE valid, median over all pairs shown'})

| cores | wall sec (best) | events/sec (best) |
|---|---|---|
| local[{lo}] | {best_lo['queries']['cdc_apply']} | {best_lo['cdc_events_per_sec']:,.0f} |
| local[{hi}] | {best_hi['queries']['cdc_apply']} | {best_hi['cdc_events_per_sec']:,.0f} |

Reproduce: `python bench.py --scaling --scaling-append --scale-low {lo}
--scale-high {hi} --events {n_events} --batches {args.batches}
--min-valid-pairs {args.min_valid_pairs} --max-pairs {args.max_pairs}`
"""
        with open(baseline_path, "a") as fh:
            fh.write(section)
    else:
        with open(baseline_path, "w") as fh:
            fh.write(md)
    print(json.dumps({
        "metric": f"cdc-apply scaling efficiency {lo}->{hi} cores "
                  f"(median of valid back-to-back pairs)",
        "value": round(median_eff, 3),
        "unit": "ratio",
        "queries": {f"pair_{i + 1}": p["eff"]
                    for i, p in enumerate(pairs)},
        "sf": sf_of(args.sf_dir),
        "valid_pairs": len(valid_effs),
        "n_pairs": len(pairs),
        "events_per_sec": {str(lo): best_lo["cdc_events_per_sec"],
                           str(hi): best_hi["cdc_events_per_sec"]},
    }))


def main_ladder(args) -> None:
    """Single-run throughput ladder over core counts (same job + same
    pre-generated input as --scaling, one taskset-pinned subprocess
    per rung, calm-window gated). NOT a paired efficiency protocol —
    one run per rung, no validity-based stopping — its purpose is the
    SHAPE: where single-node throughput saturates as cores grow,
    the supplementary evidence behind BENCH/BASELINE.md's second-span
    analysis."""
    n_events = args.events or 64_000_000
    rungs = [int(c) for c in args.ladder.split(",")]
    gen_dir = _tmpfs_dir("ladder-input")
    gen_spark = build(str(os.cpu_count() or 32))
    try:
        gen_input(gen_spark, n_events, gen_dir, 128)
    finally:
        gen_spark.stop()
    out_rows = []
    try:
        for cores in rungs:
            r = _pinned_run(args, cores, n_events, gen_dir)
            out_rows.append({
                "cores": cores,
                "events_per_sec": r["cdc_events_per_sec"],
                "wall_sec": r["queries"]["cdc_apply"],
                "loadavg_at_start": r["loadavg_at_start"],
                "steal_pct": r["steal_pct"],
            })
    finally:
        shutil.rmtree(gen_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "cdc-apply single-run throughput ladder (ev/s by "
                  "pinned core count; saturation-shape evidence, not "
                  "a paired efficiency protocol)",
        "value": out_rows[-1]["events_per_sec"] if out_rows else 0,
        "unit": "events_per_sec",
        "events": n_events,
        "rungs": out_rows,
        "sf": sf_of(args.sf_dir),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cpus", default=CPUS)
    ap.add_argument("--events", type=int, default=0)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--skip-queries", action="store_true")
    ap.add_argument("--skip-write-amp", action="store_true")
    ap.add_argument("--merge-mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--input-dir", default=None)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cadence", action="store_true",
                    help="mor compaction-cadence sweep (see SCALE.md)")
    ap.add_argument("--scale-low", type=int, default=2)
    ap.add_argument("--scale-high", type=int, default=8)
    ap.add_argument("--scaling-append", action="store_true",
                    help="append this span's evidence to BENCH/"
                         "BASELINE.md instead of replacing the "
                         "committed first-span measurement")
    ap.add_argument("--ladder", default=None,
                    help="comma-separated core counts for a single-run "
                         "throughput ladder (saturation shape, not a "
                         "paired protocol), e.g. --ladder 2,4,8,16,32")
    ap.add_argument("--min-valid-pairs", type=int, default=2)
    ap.add_argument("--max-pairs", type=int, default=6)
    ap.add_argument("--max-steal-pct", type=float, default=1.5)
    ap.add_argument("--max-load", type=float, default=5.0)
    ap.add_argument("--settle-sec", type=float, default=60.0)
    ap.add_argument("--calm-wait-max", type=float, default=900.0)
    ap.add_argument("--no-wait-calm", action="store_true",
                    help="skip the calm-window wait before the default "
                         "run (validity fields are still recorded)")
    args = ap.parse_args()
    if args.events == 0:
        args.events = None
    if args.scaling:
        main_scaling(args)
    elif args.ladder:
        main_ladder(args)
    elif args.cadence:
        main_cadence(args)
    else:
        main_default(args)


if __name__ == "__main__":
    main()
