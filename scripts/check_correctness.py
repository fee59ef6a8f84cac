#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running SparkEntry.oracleSql on the same tables.
Usage: check_correctness.py <sfDir> <verifyOutDir> [--fresh]

Wedge-resilience (VERDICT r10 #1 — three rounds of infra ate the record):
 * every oracle's verdict is appended as ONE flushed+fsync'd JSONL line to
   <verifyOutDir>/gate_progress.jsonl the moment it completes, so a kill -9
   mid-run loses at most the in-flight oracle;
 * re-invocation RESUMES by default: already-green oracles from a progress
   file whose tag matches (same oracle_sql.json bytes + same Verify parquet
   mtimes) are not re-run; pass --fresh to ignore prior progress
   (--resume is accepted as an explicit no-op for symmetry);
 * a stall watchdog dumps the PARTIAL result dict to stdout and exits(3) if
   no oracle completes for GRAFT_STALL_SECS (default 900) — a wedged DuckDB
   allocator now costs the tail of the run, never the whole record;
 * SIGTERM likewise dumps partial results before dying.
The stdout contract is unchanged: exactly one JSON object (the full —
possibly partial-under-stall — per-query result dict).
"""
import sys, json, os, hashlib, time, threading, signal
# subprocess/tempfile at MODULE scope (VERDICT r9 #1): importing them lazily
# inside run_oracle_subprocess meant a transient _posixsubprocess mmap
# ImportError (seen right after a big JVM exit) killed the WHOLE gate instead
# of costing one retry. Import once, up front, with one retry for the same
# transient mmap failure.
for _attempt in range(2):
    try:
        import subprocess, tempfile
        break
    except ImportError:
        if _attempt == 1:
            raise
        time.sleep(10)
import duckdb

# r7 and r9 each lost 6 green rows to a single long-lived DuckDB connection
# whose allocator wedged mid-run (8-16 KB allocation failures on oracles that
# individually pass at 1 GB). Recycle the connection every N oracles so
# allocator state can't accumulate across the whole 176-query run; sf0.01
# connect cost is trivial.
CON_RECYCLE_EVERY = int(os.environ.get("GRAFT_CON_RECYCLE", "20"))

# GRAFT_SUBPROCESS_ALL=1: run EVERY oracle in its own short-lived process
# (the escalation path made the default). Slower (~2 s spawn per oracle) but
# categorically immune to the in-process failure family seen at sf0.1/48GB:
# the buffer-pool wedge across sequential heavy oracles AND the post-OOM
# state where even spawning a Python thread hits MemoryError. The big-SF
# manual sweep should set this; the driver's sf0.01/6GB gate keeps the
# fast in-process path.
SUBPROCESS_ALL = os.environ.get("GRAFT_SUBPROCESS_ALL", "") == "1"

# No-progress window before the watchdog dumps partial results and exits.
# 900 s clears the heaviest sf0.1 spill oracle (~5 min) with 3x headroom.
STALL_SECS = int(os.environ.get("GRAFT_STALL_SECS", "900"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracles whose CTEs materialize corpus-sized intermediates (recursive
# component propagation, corpus×cluster term rollups, suffix/span spectra,
# minhash signature frames). VERDICT r11 #1: two of these OOM'd the loaded
# driver box and the in-process retry reused the same exhausted allocator.
# These run in a FRESH PROCESS from the start (fresh allocator + spill dir),
# never on the shared in-process connection; on failure, ONE retry at a
# HALVED memory_limit — a lower budget makes DuckDB go out-of-core earlier
# instead of racing the box's free memory.
HEAVY_ORACLES = {
    "cluster_topics", "dedup_best_survivors", "dedup_survivors",
    "dedup_components", "dup_cluster_sizes", "dup_inflation_by_source",
    "dup_pagerank", "split_leakage", "dedup_report", "dedup_summary",
    "semdedup", "semdedup_sweep", "dup_span_stats", "dup_span_exact",
    "suffix_repeats", "repeat_coverage", "substr_dedup",
    # prefix-join oracle materializes the corpus-sized shingle frame plus
    # the positional-filtered candidate set (~0.5M pairs at sf0.1)
    "dedup_prefix_exact",
    "trim_common_paragraphs", "corpus_diff",
    # trigram-KN oracles materialize the per-doc trigram explode (~3x the
    # corpus token count) plus the bigram type frame
    "kn3_trigram_top", "kn3_perplexity", "kn3_buckets",
    # 4-gram-KN oracles add the fourgram explode and trigram type frame
    "kn4_fourgram_top", "kn4_perplexity", "kn4_buckets",
    # 5-gram-KN oracles materialize the fivegram explode plus the 4-gram,
    # trigram and bigram type frames
    "kn5_fivegram_top", "kn5_perplexity", "kn5_buckets",
}


def _halve_mem(mem):
    """'6GB' -> '3GB', '6.5GiB' -> '3GiB', '6000M' -> '3000MB' (floor 1).
    Accepts fractional values and GB/GiB/MB/MiB/G/M suffixes; anything
    unparseable falls back to 2GB WITH a warning (ADVICE r12: a silent
    fallback could run a heavy-oracle retry on far less memory than the
    operator intended)."""
    import re
    import sys
    m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*([GM])(I?)B?", mem.strip(),
                     re.IGNORECASE)
    if not m:
        print(f"warning: unparseable GRAFT_DUCKDB_MEM {mem!r}; "
              "retry falls back to 2GB", file=sys.stderr)
        return "2GB"
    # keep the binary/decimal unit of the input: '6GiB' must halve to
    # '3GiB', not a silently ~7%-smaller '3GB'
    unit = m.group(2).upper() + ("iB" if m.group(3) else "B")
    return f"{max(1, int(float(m.group(1)) // 2))}{unit}"

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # match plausible driver normalization: repr of float
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

# Round-5 lesson (VERDICT r5): the driver's fingerprint is sensitive to each
# value's ENGINE-level type — DuckDB HUGEINT sums vs Spark BIGINT, and
# DECIMAL-pinned outputs vs DOUBLE, hash-differently on the driver even when
# the stringified values match. This gate is therefore STRICTER than value
# equality: (a) the fingerprint includes each column's resolved engine type,
# so a Spark-vs-oracle type mismatch fails the hash; (b) a hard policy bans
# any compared output column whose type is DECIMAL or HUGEINT on EITHER side
# — the r4/r5 driver data proves the only driver-safe compared types are
# BIGINT/INTEGER, DOUBLE, VARCHAR (+ BOOLEAN/DATE/TIMESTAMP/arrays thereof).
BANNED_TYPES = ("DECIMAL", "HUGEINT", "INT128", "UINT64", "UHUGEINT", "FLOAT")

def banned_types(cols, types):
    return sorted(f"{c}:{t}" for c, t in zip(cols, types)
                  if any(b in t.upper() for b in BANNED_TYPES))

def frame_fingerprint(cols, types, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    typed_cols = [f"{cols[i]}\x1e{types[i]}" for i in order]
    h = hashlib.sha256(
        ("\x1f".join(typed_cols) + "\n" + "\n".join(lines)).encode()).hexdigest()
    return sorted(cols), len(rows), h

def _connect_with_timeout(timeout_s=60):
    """duckdb.connect() can HANG (not raise) when the box is in an
    allocation stall — observed live: a gate run blocked >10 min inside a
    reconnect while the faulthandler watchdog showed the stack parked at
    the reconnect call. Run the connect on a daemon thread with a timeout
    so a stall becomes a retryable exception instead of an infinite hang.

    Late-completion protocol (ADVICE r10): a connect that finishes AFTER
    the consumer timed out must not leak native allocator state. The lock
    makes hand-off vs abandonment a single atomic decision: the worker
    only enqueues while the consumer has not marked the slot taken; a
    worker that loses the race closes its connection itself, and a
    consumer that times out does one locked drain so a connection already
    enqueued is used rather than stranded."""
    import queue
    q = queue.Queue(maxsize=1)
    lock = threading.Lock()
    state = {"taken": False, "delivered": False}
    def run():
        try:
            c = duckdb.connect()
        except BaseException as e:  # noqa: BLE001 - marshalled to caller
            q.put(e)
            return
        with lock:
            if not state["taken"]:
                q.put(c)
                state["delivered"] = True
                return
        try:
            c.close()
        except Exception:
            pass
    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        r = q.get(timeout=timeout_s)
    except queue.Empty:
        with lock:
            state["taken"] = True
            delivered = state["delivered"]
        if delivered:
            r = q.get_nowait()  # worker enqueued in the race window
        else:
            raise RuntimeError(f"duckdb.connect() hung >{timeout_s}s "
                               "(allocation stall)")
    if isinstance(r, BaseException):
        raise r
    return r


def fresh_con(sf_dir):
    # Pin a budget + spill dir: under concurrent JVM memory pressure DuckDB
    # otherwise fails sporadically with "Out of Memory Error: Failed to
    # allocate block" on the heavier oracle queries (seen flapping r7) —
    # with a temp_directory those queries go out-of-core instead.
    # 6GB default keeps concurrent-JVM sf0.01 gating stable; the manual
    # sf0.1 sweep should raise it (GRAFT_DUCKDB_MEM=48GB) — at sf0.1 the
    # heavy gram/span oracles spill hundreds of GB under the 6GB pin.
    con = _connect_with_timeout()
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '6GB')}'")
    con.execute("SET temp_directory='/tmp/graft_duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def reconnect(sf_dir, old_con):
    """Mid-run reconnect with the same transient-malloc backoff the startup
    path uses (ADVICE r8: an unguarded fresh_con inside a retry except-block
    could itself throw and kill the whole gate). If every attempt fails,
    hand back the old — possibly wedged — connection so the caller's next
    attempt fails per-query and the run records an error row and moves on."""
    for attempt in range(5):
        try:
            return fresh_con(sf_dir)
        except Exception:
            time.sleep(5 * (attempt + 1))
    return old_con


def run_oracle_subprocess(sf_dir, sql, mem=None):
    """Last-resort OOM escalation: run one oracle in a FRESH python process
    (fresh DuckDB allocator) with a raised memory budget + spill dir.
    Returns (cols, types, rows) or None."""
    mem = mem or os.environ.get("GRAFT_DUCKDB_RETRY_MEM", "24GB")
    with tempfile.NamedTemporaryFile("w", suffix=".sql", delete=False) as f:
        f.write(sql)
        sql_path = f.name
    helper = (
        "import sys, json, duckdb, os\n"
        "sf, sql_path, mem = sys.argv[1:4]\n"
        "con = duckdb.connect()\n"
        "con.execute(f\"SET memory_limit='{mem}'\")\n"
        "con.execute(\"SET temp_directory='/tmp/graft_duckdb_spill'\")\n"
        # DuckDB's progress bar writes to STDOUT on queries >2s and would
        # corrupt the JSON hand-off (found live r11: every >2s oracle
        # "failed in subprocess" while short ones passed)
        "con.execute('SET enable_progress_bar=false')\n"
        f"for t in {TABLES!r}:\n"
        "    p = f'{sf}/{t}.parquet'\n"
        "    if os.path.exists(p):\n"
        "        con.execute(f\"CREATE VIEW {t} AS SELECT * FROM '{p}'\")\n"
        "sql = open(sql_path).read()\n"
        "desc = con.execute(f'DESCRIBE ({sql})').fetchall()\n"
        "rows = con.execute(sql).fetchall()\n"
        "json.dump({'cols': [r[0] for r in desc], 'types': [r[1] for r in desc],\n"
        "           'rows': rows}, sys.stdout, default=str)\n")
    try:
        out = subprocess.run(
            [sys.executable, "-c", helper, sf_dir, sql_path, mem],
            capture_output=True, text=True,
            # the heaviest sf0.1 oracles (components chain, semdedup,
            # suffix spectrum) need >600s out-of-core in a fresh process
            timeout=int(os.environ.get("GRAFT_ORACLE_TIMEOUT", "1800")))
        if out.returncode != 0:
            return None
        # belt and braces: parse from the first '{' so any residual
        # stdout noise ahead of the JSON can't fail the hand-off
        d = json.loads(out.stdout[out.stdout.index("{"):])
        return d["cols"], d["types"], [tuple(r) for r in d["rows"]]
    except Exception:
        return None
    finally:
        os.unlink(sql_path)


# ---- wedge-resilient record keeping ----------------------------------------

# name of the oracle being processed, surfaced on any fatal exit so a
# crashed gate run still says WHERE it died (VERDICT r9 #1d)
_CURRENT = [None]
# shared with the watchdog thread: accumulated results + last-progress stamp
_RESULTS = {}
_LAST_PROGRESS = [time.time()]
_DUMP_LOCK = threading.Lock()
_DUMPED = [False]


def _dump_results(reason, code):
    """Print the (possibly partial) result dict to stdout exactly once.
    Called from normal end-of-run, the stall watchdog, and SIGTERM."""
    with _DUMP_LOCK:
        if _DUMPED[0]:
            return
        _DUMPED[0] = True
    print(json.dumps(_RESULTS, indent=1, default=str))
    sys.stdout.flush()
    n_ok = sum(1 for r in _RESULTS.values() if r.get("ok"))
    print(f"== {n_ok}/{len(_RESULTS)} ok", file=sys.stderr)
    if reason:
        print(f"== PARTIAL ({reason}) at query: {_CURRENT[0]}", file=sys.stderr)
    sys.stderr.flush()
    if code is not None:
        os._exit(code)


def _progress_tag(sf_dir, out_dir, name, oracle_sql):
    """PER-QUERY resume identity. A green line is reusable only while this
    query's oracle SQL and its Verify parquet dump are both unchanged —
    the dump is pinned by the file names+mtimes inside its dir, so a
    re-run of Verify (full or filtered) invalidates exactly the queries it
    rewrote and nothing else."""
    h = hashlib.sha256()
    h.update(os.path.abspath(sf_dir).encode())
    h.update(name.encode())
    h.update((oracle_sql or "\x00rows-only").encode())
    d = os.path.join(out_dir, name)
    try:
        for f in sorted(os.listdir(d)):
            st = os.stat(os.path.join(d, f))
            h.update(f"{f}|{st.st_size}|{int(st.st_mtime)}".encode())
    except OSError:
        pass
    return h.hexdigest()[:16]


def _load_progress(path, tags):
    """Prior green verdicts whose per-query tag still matches (corrupt/
    partial trailing lines — a kill mid-write — are skipped, not fatal)."""
    resumed = {}
    if not os.path.exists(path):
        return resumed
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except Exception:
                    continue
                name = rec.get("name")
                if (name in tags and rec.get("tag") == tags[name]
                        and rec.get("result", {}).get("ok")):
                    resumed[name] = rec["result"]
    except Exception:
        return {}
    return resumed


def _watchdog():
    """If no oracle completes for STALL_SECS, assume the allocator wedged.
    First escalation: RE-EXEC this gate once in subprocess-per-oracle mode
    (immune to the in-process stall family — observed live r11:
    duckdb.connect blocked inside pthread-create); the progress file makes
    the re-exec resume every green oracle, so the driver still gets a FULL
    record from its single invocation. If we already re-exec'd (or exec
    itself fails under the same pressure), dump the partial record and
    exit(3). Partial > empty: r10's official record was {} for 176
    locally-green queries."""
    while True:
        time.sleep(15)
        if time.time() - _LAST_PROGRESS[0] > STALL_SECS:
            if os.environ.get("GRAFT_STALL_REEXEC") != "1":
                print(f"== STALL >{STALL_SECS}s at {_CURRENT[0]}: re-exec "
                      "in subprocess-per-oracle mode (resuming greens)",
                      file=sys.stderr, flush=True)
                env = dict(os.environ,
                           GRAFT_STALL_REEXEC="1", GRAFT_SUBPROCESS_ALL="1")
                # never re-exec with --fresh: the wipe (if any) already
                # happened and the whole point is resuming the greens
                argv = [a for a in sys.argv if a != "--fresh"]
                try:
                    os.execve(sys.executable, [sys.executable] + argv, env)
                except Exception:
                    pass  # exec failed under the same pressure — fall through
            _dump_results(f"stalled >{STALL_SECS}s", 3)


def main(sf_dir, out_dir, fresh=False):
    # the initial connect can race a just-exited Spark JVM's memory release
    # (seen r8: CREATE VIEW failed to malloc 1.5 KB seconds after Verify
    # finished) — retry with backoff before giving up
    con = None
    for attempt in range(5):
        try:
            con = fresh_con(sf_dir)
            break
        except Exception:
            if attempt == 4:
                raise
            time.sleep(5 * (attempt + 1))
    oracle_bytes = open(f"{out_dir}/oracle_sql.json", "rb").read()
    oracle = json.loads(oracle_bytes)
    results = _RESULTS
    tags = {name: _progress_tag(sf_dir, out_dir, name, oracle.get(name))
            for name in sorted(os.listdir(out_dir))
            if os.path.isdir(os.path.join(out_dir, name))}
    progress_path = os.environ.get("GRAFT_GATE_PROGRESS",
                                   os.path.join(out_dir, "gate_progress.jsonl"))
    if fresh:
        try:
            os.unlink(progress_path)
        except FileNotFoundError:
            pass
    else:
        results.update(_load_progress(progress_path, tags))
        if results:
            print(f"== resumed {len(results)} green oracles from "
                  f"{progress_path}", file=sys.stderr, flush=True)
    progress_f = open(progress_path, "a")

    def emit(name, result):
        results[name] = result
        progress_f.write(json.dumps(
            {"tag": tags.get(name), "name": name, "result": result},
            default=str) + "\n")
        progress_f.flush()
        os.fsync(progress_f.fileno())
        _LAST_PROGRESS[0] = time.time()
        print(f"== gate: {name} "
              f"{'ok' if result.get('ok') else 'FAIL'}",
              file=sys.stderr, flush=True)

    threading.Thread(target=_watchdog, daemon=True).start()
    signal.signal(signal.SIGTERM,
                  lambda *_: _dump_results("SIGTERM", 143))

    n_since_recycle = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if name in results and results[name].get("ok"):
            continue  # resumed green — never re-run more than once
        _CURRENT[0] = name
        # proactive recycle (VERDICT r9 #1): don't let one connection serve
        # all 176 oracles — allocator state accumulates and wedges mid-run
        # even when no single oracle needs the budget.
        n_since_recycle += 1
        if n_since_recycle > CON_RECYCLE_EVERY:
            old = con
            con = reconnect(sf_dir, con)
            if con is not old:
                try:
                    old.close()
                except Exception:
                    pass
            n_since_recycle = 1
        s_err = None
        for attempt in range(3):
            try:
                s_desc = con.execute(
                    f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()
                s_cols = [r[0] for r in s_desc]
                s_types = [r[1] for r in s_desc]
                s_rows = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
                s_err = None
                break
            except Exception as e:
                # a wedged connection (OOM, spill-dir hiccup) poisons every
                # later query on it — reconnect before retrying (seen as
                # whole-run mass failures r7)
                s_err = e
                time.sleep(2)
                con = reconnect(sf_dir, con)
        if s_err is not None:
            emit(name, {"error": f"spark result unreadable: {s_err}"})
            continue
        if name not in oracle:
            emit(name, {"rows": len(s_rows), "rows_only": True,
                        "ok": len(s_rows) > 0})
            continue
        if SUBPROCESS_ALL or name in HEAVY_ORACLES:
            base_mem = os.environ.get("GRAFT_DUCKDB_MEM", "6GB")
            ctr = run_oracle_subprocess(sf_dir, oracle[name], mem=base_mem)
            if ctr is None:
                # retry policy differs by why we're here: a HEAVY oracle
                # that failed most plausibly lost a memory race — halve
                # the budget so the retry spills instead of racing; the
                # subprocess-all escalation path keeps its raised-budget
                # retry (spawn hiccups, not allocator pressure).
                retry_mem = (_halve_mem(base_mem) if name in HEAVY_ORACLES
                             else os.environ.get("GRAFT_DUCKDB_RETRY_MEM",
                                                 "24GB"))
                ctr = run_oracle_subprocess(sf_dir, oracle[name],
                                            mem=retry_mem)
            if ctr is None:
                emit(name, {"error": "oracle failed in subprocess"})
                continue
            o_cols, o_types, o_rows = ctr
            sc, sn, sh = frame_fingerprint(s_cols, s_types, s_rows)
            oc, on, oh = frame_fingerprint(o_cols, o_types, o_rows)
            bad_types = (banned_types(s_cols, s_types)
                         + banned_types(o_cols, o_types))
            emit(name, {
                "rows_match": sn == on, "schema_match": sc == oc,
                "hash_match": sh == oh, "rows": sn, "oracle_rows": on,
                "type_policy_ok": not bad_types,
                "ok": sn == on and sc == oc and sh == oh and not bad_types,
            })
            continue
        # Transient OOM ("Failed to allocate block") is an infra condition,
        # not a mismatch — retry before recording an error.
        o_err = None
        for attempt in range(3):
            try:
                o_desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
                o_cols = [r[0] for r in o_desc]
                o_types = [r[1] for r in o_desc]
                o_rows = con.execute(oracle[name]).fetchall()
                o_err = None
                break
            except Exception as e:
                o_err = e
                # Deterministic failures — a broken oracle row (parse/bind)
                # or a value-level runtime error (conversion, out-of-range,
                # decimal overflow) — re-execute identically every time;
                # fail fast instead of burning 3 heavy retries (ADVICE r7).
                if isinstance(e, (duckdb.ParserException, duckdb.BinderException,
                                  duckdb.ConversionException,
                                  duckdb.OutOfRangeException)):
                    break
                time.sleep(2)
                con = reconnect(sf_dir, con)  # see spark-read retry note
        if isinstance(o_err, duckdb.OutOfMemoryException):
            # An OOM wedge can poison the allocator beyond what a fresh
            # CONNECTION in this process recovers (r7 driver run) — escalate
            # to a fresh PROCESS with a raised per-query budget.
            cols_types_rows = run_oracle_subprocess(sf_dir, oracle[name])
            if cols_types_rows is not None:
                o_cols, o_types, o_rows = cols_types_rows
                o_err = None
            con = reconnect(sf_dir, con)  # this process's con may still be wedged
        if o_err is not None:
            emit(name, {"error": f"oracle failed: {o_err}"})
            continue
        sc, sn, sh = frame_fingerprint(s_cols, s_types, s_rows)
        oc, on, oh = frame_fingerprint(o_cols, o_types, o_rows)
        bad_types = banned_types(s_cols, s_types) + banned_types(o_cols, o_types)
        result = {
            "rows_match": sn == on, "schema_match": sc == oc,
            "hash_match": sh == oh, "rows": sn, "oracle_rows": on,
            "type_policy_ok": not bad_types,
            "ok": sn == on and sc == oc and sh == oh and not bad_types,
        }
        if bad_types:
            result["banned_types"] = bad_types
        if sh != oh and sc == oc and sn == on:
            st = {c: t for c, t in zip(s_cols, s_types)}
            ot = {c: t for c, t in zip(o_cols, o_types)}
            mism = {c: [st[c], ot[c]] for c in st if st[c] != ot.get(c, st[c])}
            if mism:
                result["type_mismatch"] = mism
            # find first differing row for debugging
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            oorder = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            sl = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in s_rows)
            ol = sorted("\x1f".join(norm_cell(r[i]) for i in oorder) for r in o_rows)
            for a, b in zip(sl, ol):
                if a != b:
                    result["first_diff"] = {"spark": a[:300], "oracle": b[:300]}
                    break
        emit(name, result)
    _CURRENT[0] = None
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    _dump_results(None, None)
    if not results:
        # an empty Verify output dir must not read as a vacuous pass
        print("== FAIL: no result directories found", file=sys.stderr)
        return 1
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    try:
        # hang watchdog: environment-level stalls (post-JVM allocator
        # pressure has produced both silent hangs and thread-local
        # allocation aborts) — dump all stacks every 5 minutes, diagnostic
        # only; the STALL_SECS watchdog above is the one that acts.
        try:
            import faulthandler
            faulthandler.dump_traceback_later(300, repeat=True, exit=False)
        except Exception:
            pass
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        flags = {a for a in sys.argv[1:] if a.startswith("--")}
        sys.exit(main(args[0], args[1], fresh="--fresh" in flags))
    except SystemExit:
        raise
    except BaseException:
        if _CURRENT[0]:
            print(f"== FATAL while processing query: {_CURRENT[0]}",
                  file=sys.stderr)
        raise
