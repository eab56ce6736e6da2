#!/usr/bin/env python3
"""Differential parity gate: the engine vs the REFERENCE ITSELF.

Every oracle in CORRECTNESS_r*.json verifies the engine against a DuckDB
*reformulation* that this repo's author also wrote — a shared-misreading
blind spot. This gate closes it: it loads the reference's own module
(/root/reference/elb_logs.py) and runs its actual functions
(parse_log_line, merge_geocachedf_with_elbdf, filter_categorize_df,
categorize_status, extract_time_features, calculate_processing_times,
sessionize_logs, add_rolling_features, add_path_features, and the four
export_* sinks) under pandas over a synthesized gzip corpus, runs the
engine's whole-DAG ElbPipeline.run (via graft.RefDiffRun) over the SAME
corpus, and diffs the enriched frame plus every sink output
column-by-column.

Substitutions (and why they are sound):
 - S3 I/O (transform_logs' boto3 loop) is replaced by a local loop over
   the same gzip files calling the reference's parse_log_line verbatim —
   the object-store transport is not under test here.
 - fetch_geolocation_data (live HTTP) is replaced by a Python mirror of
   the engine's deterministic StaticGeoProvider with a FIXED clock, fed
   through the reference's real update_geolocation_cache/merge functions.
   Both sides therefore see identical geo data, and api_fetch_timestamp
   is comparable.
 - user_agents (not installable; zero-egress) replays the committed
   golden fixture tools/ua_golden.csv — browser/os families for every
   corpus UA, derived from the PUBLIC uap-core regexes.yaml rules the
   library evaluates — so ua_browser_family / ua_os_family ARE diffed
   since round 11. UaSpec additionally pins the engine's UA table,
   including the reference test's "Datadog Agent/7.54.0" → Other/Other.
 - optimize_dtypes is skipped on the reference side (dtype-narrowing
   no-op; parquet dictionary encoding covers it — SURVEY.md §1.2).

Usage: python3 tools/ref_diff.py [--lines N] [--json OUT.json]
Exit 0 iff every artifact diff is clean.
"""
import argparse
import glob
import gzip
import json
import os
import random
import subprocess
import sys
import tempfile
import types

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/elb_logs.py"
FIXED_CLOCK = pd.Timestamp("2026-08-14 00:00:00")
CLOCK_MILLIS = 1786665600000  # 2026-08-14T00:00:00Z epoch millis

# ---------------------------------------------------------------- corpus

UAS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/15E148",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
    "curl/8.0.1",
    "python-urllib/3.11",
    "UptimeRobot/2.0 (http://www.uptimerobot.com/)",
    "Pingdom.com_bot_version_1.4_(http://www.pingdom.com/)",
    "Datadog Agent/7.54.0",          # health-check: filtered by both sides
    "kube-probe/1.27",               # health-check: filtered
    "ELB-HealthChecker/2.0",         # 'healthchecker': filtered
    "NewRelicPinger/1.0",            # bot (newrelic), kept
]

URLS = [
    "https://members.example.com:443/",
    "https://api.example.com/v1/items/123?x=1&y=2",
    "https://api.example.com/v1/items/",
    "http://static.example.com/assets/img/logo.png",
    "https://example.com",
    "https://example.com/search?q=a%20b&page=3",
    "https://example.com/a/b/c/d/e",
    "https://svc0.example.com:8443/metrics",
]

STATUSES = ["200", "200", "200", "201", "204", "301", "302", "304",
            "400", "403", "404", "404", "499", "500", "502", "503"]

ERROR_REASONS = ['"-"', '"-"', '"-"', '"LambdaInvalidResponse"', '"AuthInvalidIdToken"']
CLASS_REASONS = ['"-"', '"-"', '"-"', '"-"', '"WafBlocked"', '"DenyRule"',
                 '"NonCompliantVersion"', '"Blocked"']


def gen_corpus(logs_dir, n_lines, seed=20260814):
    """Deterministic ELB-shaped corpus: ~180 IPs with per-IP increasing
    millisecond-aligned timestamps (gaps straddle the 30-min session
    boundary), planted malformations on every parser drop path, '-'
    sentinels, '- - -' requests, health-check and bot UAs, WAF reasons,
    and geo-error IPs (last octet % 97 == 0). (ip, time) pairs are
    unique so the reference's rolling re-attach merge stays 1:1."""
    rng = random.Random(seed)
    ips = []
    for i in range(180):
        b, c = rng.randrange(256), rng.randrange(256)
        d = 97 if i % 23 == 0 else rng.randrange(1, 250)  # some geo errors
        ips.append(f"198.51.{c % 200}.{d}" if b % 2 else f"10.{b}.{c}.{d}")
    base = pd.Timestamp("2025-05-26 12:00:00")
    ip_clock = {ip: base + pd.Timedelta(seconds=i * 7) for i, ip in enumerate(ips)}

    lines, nfile = [], 0
    for i in range(n_lines):
        ip = ips[rng.randrange(len(ips))]
        # advance this IP's clock: mostly small steps, sometimes > 30 min
        step_s = rng.choice([5, 17, 40, 90, 300, 500, 2200]) + rng.randrange(1000) / 1000.0
        ip_clock[ip] += pd.Timedelta(seconds=round(step_s, 3))
        t = ip_clock[ip]
        ts = t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"

        r = rng.random()
        if r < 0.006:
            lines.append("garbage short line")        # arity drop
            continue
        if r < 0.008:
            lines.append("")                           # empty: arity drop
            continue

        proc = lambda: rng.choice(["-", f"0.{rng.randrange(1000):03d}",
                                   f"0.{rng.randrange(1000):03d}",
                                   f"0.{rng.randrange(1000):03d}"])
        rp, tp, sp = proc(), proc(), proc()
        if r < 0.012:
            rp = "abc"                                 # float() raises: row drop
        status = "-" if rng.random() < 0.05 else rng.choice(STATUSES)
        tstatus = "-" if rng.random() < 0.08 else status
        rcv = "-" if rng.random() < 0.04 else str(rng.randrange(40, 9000))
        snt = "-" if rng.random() < 0.04 else str(rng.randrange(100, 60000))
        if rng.random() < 0.02:
            request = '"- - -"'                        # connection closed early
        else:
            m = rng.choice(["GET", "GET", "GET", "POST", "HEAD", "PUT"])
            v = rng.choice(["HTTP/1.1", "HTTP/1.1", "HTTP/2.0"])
            request = f'"{m} {rng.choice(URLS)} {v}"'
        ua = rng.choice(UAS)
        rct = (t - pd.Timedelta(milliseconds=rng.randrange(5, 80))
               ).strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        if rng.random() < 0.01:
            rct = "not a timestamp"                    # lenient parse: NaT
        bad_time = r >= 0.012 and r < 0.014
        line = " ".join([
            rng.choice(["https", "https", "https", "http", "h2"]),
            "not-a-time" if bad_time else ts,          # strict parse: row drop
            "app/ref-elb/50dc6c495c0c9188",
            f"{ip}:{rng.randrange(1024, 65000)}",
            rng.choice(["172.31.37.43:80", "172.31.44.11:8080", "-"]),
            rp, tp, sp,
            status, tstatus, rcv, snt,
            request,
            f'"{ua}"',
            rng.choice(["TLS_AES_128_GCM_SHA256", "ECDHE-RSA-AES128-GCM-SHA256", "-"]),
            rng.choice(["TLSv1.3", "TLSv1.2", "-"]),
            "arn:aws:elasticloadbalancing:us-west-2:123456789012:targetgroup/ref/abc123",
            f'"Root=1-{i:08x}"',                       # unique join key
            '"app.example.com"',
            rng.choice(['"arn:aws:acm:us-west-2:123456789012:certificate/id"', '"-"']),
            rng.choice(["1", "0", "-"]),
            rct,
            rng.choice(['"waf,forward"', '"forward"', '"authenticate,forward"']),
            '"-"',
            rng.choice(ERROR_REASONS),
            '"172.31.37.43:80"',
            f'"{tstatus}"',
            rng.choice(['"-"', '"Acceptable"', '"Ambiguous"']),
            rng.choice(CLASS_REASONS),
        ])
        lines.append(line)
        if len(lines) >= (n_lines // 4) and nfile < 3:
            with gzip.open(os.path.join(logs_dir, f"part{nfile}.log.gz"), "wt",
                           encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
            lines, nfile = [], nfile + 1
    with gzip.open(os.path.join(logs_dir, f"part{nfile}.log.gz"), "wt",
                   encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


# ------------------------------------------------- reference-side runner

def load_ua_golden():
    """The committed user_agents golden fixture (tools/ua_golden.csv,
    tab-separated): browser/os families for every UA in the corpus,
    derived from the PUBLIC uap-core regexes.yaml rules (the database
    the user_agents library evaluates). The library itself is not
    installable here (zero egress), so the reference pipeline replays
    this fixture; the diff then verifies the engine's Ua rule table
    end-to-end against it, column-for-column."""
    path = os.path.join(REPO, "tools/ua_golden.csv")
    table = {}
    with open(path) as f:
        next(f)  # header
        for line in f:
            ua, browser, osfam = line.rstrip("\n").split("\t")
            table[ua] = (browser, osfam)
    return table


def load_reference(workdir):
    """Import the reference module from its read-only source with
    user_agents replaying the committed golden fixture, BASE_DIR
    pointed at a writable workdir, and no network touched (boto3
    client construction is offline-safe)."""
    golden = load_ua_golden()
    ua = types.ModuleType("user_agents")

    class _Fam:
        def __init__(self, family):
            self.family = family

    class _UA:
        def __init__(self, browser, osfam):
            self.browser = _Fam(browser)
            self.os = _Fam(osfam)

    def _parse(s):
        if s not in golden:  # fail loud: an unpinned UA would silently
            raise KeyError(  # turn the ua columns into fixture noise
                f"UA not in tools/ua_golden.csv: {s!r}")
        return _UA(*golden[s])

    ua.parse = _parse
    sys.modules["user_agents"] = ua

    src = open(REF_SRC).read()
    mod = types.ModuleType("elb_ref")
    mod.__file__ = os.path.join(workdir, "elb_logs.py")
    os.chdir(workdir)  # module writes logs.txt + output/ relative to here
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def static_geo(ip):
    """Python mirror of the engine's StaticGeoProvider (GeoProvider.scala):
    geolocation derived from the IP's octets; d % 97 == 0 simulates an
    API failure. Clock fixed so api_fetch_timestamp is diffable."""
    parts = ip.split(".")
    err = {
        "client_ip": ip, "countryCode": "Error", "countryName": "Error",
        "regionName": "Error", "city": "Error", "lat": np.nan, "lon": np.nan,
        "isp": "Error", "api_fetch_timestamp": FIXED_CLOCK,
    }
    if len(parts) != 4:
        return err
    try:
        _, b, c, d = [int(p) for p in parts]
    except ValueError:
        return err
    if b < 0 or c < 0 or d < 0 or d % 97 == 0:
        return err
    return {
        "client_ip": ip,
        "countryCode": f"C{d % 5}",
        "countryName": f"Country-{d % 5}",
        "regionName": f"R{c % 10}",
        "city": f"City-{(c + d) % 20}",
        "lat": (d % 180) - 90 + 0.5,
        "lon": (c % 360) - 180 + 0.25,
        "isp": f"ISP-{b % 3}",
        "api_fetch_timestamp": FIXED_CLOCK,
    }


def run_reference(mod, logs_dir):
    """The reference main() (elb_logs.py:398-437) with its real transform
    functions, minus S3/HTTP transports (see module docstring)."""
    parsed = []
    for path in sorted(glob.glob(os.path.join(logs_dir, "*.gz"))):
        key = os.path.basename(path)
        with gzip.open(path, "rb") as gz:
            for line in gz:
                rec = mod.parse_log_line(line.decode("utf-8").strip(), key)
                if rec:
                    parsed.append(rec)
    df = pd.DataFrame(parsed)

    geo_cache = mod.load_geolocation_cache()
    new_ips = [ip for ip in df["client_ip"].unique() if ip not in geo_cache.index]
    geo_results = [static_geo(ip) for ip in new_ips]
    if geo_results:
        geo_cache = mod.update_geolocation_cache(geo_results)

    df = mod.merge_geocachedf_with_elbdf(df, geo_cache)
    df = mod.filter_categorize_df(df)
    df = mod.extract_time_features(df)
    df = mod.calculate_processing_times(df)
    df = mod.sessionize_logs(df)
    df = mod.add_rolling_features(df)
    df = mod.add_path_features(df)
    # optimize_dtypes skipped (see module docstring)

    mod.export_cleaned_logs(df.copy())
    mod.export_hourly_aggregates(df)
    mod.export_error_summary(df)
    mod.export_bot_traffic(df)
    return df


# ------------------------------------------------------ spark-side runner

def run_spark(logs_dir, out_dir, cache_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [os.path.join(REPO, "tools/run.sh"), "graft.RefDiffRun",
         os.path.join(logs_dir, "*.gz"), cache_path, out_dir,
         str(CLOCK_MILLIS)],
        env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise RuntimeError("RefDiffRun failed")


# -------------------------------------------------------------- the diff

# No excluded columns: the ua families compare against the committed
# uap-core golden fixture (load_ua_golden) since round 11.
EXCLUDED = set()

TS_COLS = {"time", "request_creation_time", "api_fetch_timestamp"}
FLOAT_COLS = {"request_processing_time", "target_processing_time",
              "response_processing_time", "lat", "lon",
              "total_processing_time", "rolling_1h_avg_processing"}
NUM_COLS = {"elb_status_code", "target_status_code", "received_bytes",
            "sent_bytes", "port", "session_number", "path_depth",
            "request_year", "request_month", "request_day", "request_hour",
            "request_day_of_week_num", "request_week_of_year",
            "rolling_5min_request_count"}
BOOL_COLS = {"is_bot", "waf_blocked", "new_session"}


def canon_ts(s):
    v = pd.to_datetime(s, utc=True, format="mixed", errors="coerce")
    return v.astype("int64") // 1000  # micros; NaT -> sentinel min


def diff_frames(name, ref, eng, key, report, float_rtol=1e-9):
    """Column-by-column value diff of two keyed frames; appends one entry
    per column (or key/count failure) to report[name]."""
    entry = {"ref_rows": int(len(ref)), "eng_rows": int(len(eng)), "columns": {}}
    report[name] = entry
    rk, ek = set(ref[key]), set(eng[key])
    if rk != ek:
        entry["key_mismatch"] = {
            "ref_only": sorted(rk - ek)[:5], "eng_only": sorted(ek - rk)[:5],
            "ref_only_n": len(rk - ek), "eng_only_n": len(ek - rk)}
        return False
    ref = ref.sort_values(key).reset_index(drop=True)
    eng = eng.sort_values(key).reset_index(drop=True)
    ok = True
    common = [c for c in ref.columns
              if c in set(eng.columns) and c not in EXCLUDED and c != key]
    entry["ref_only_cols"] = sorted(set(ref.columns) - set(eng.columns) - EXCLUDED)
    entry["eng_only_cols"] = sorted(set(eng.columns) - set(ref.columns))
    for c in sorted(common):
        r, e = ref[c], eng[c]
        if c in TS_COLS:
            bad = canon_ts(r).values != canon_ts(e).values
        elif c in FLOAT_COLS or c in NUM_COLS:
            rv = pd.to_numeric(r, errors="coerce").astype("float64").values
            ev = pd.to_numeric(e, errors="coerce").astype("float64").values
            bad = ~(np.isclose(rv, ev, rtol=float_rtol, atol=1e-12,
                               equal_nan=True))
        elif c in BOOL_COLS:
            bad = r.astype("boolean").fillna(False).values != \
                e.astype("boolean").fillna(False).values
        else:
            bad = r.astype("object").where(r.notna(), "\0NULL").astype(str).values != \
                e.astype("object").where(e.notna(), "\0NULL").astype(str).values
        n_bad = int(bad.sum())
        entry["columns"][c] = n_bad
        if n_bad:
            ok = False
            i = int(np.argmax(bad))
            entry.setdefault("examples", {})[c] = {
                "key": str(ref[key].iloc[i]),
                "ref": repr(r.iloc[i]), "eng": repr(e.iloc[i])}
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=12000)
    ap.add_argument("--seed", type=int, default=20260814)
    ap.add_argument("--json", default=os.path.join(REPO, "REF_DIFF.json"))
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="refdiff-")
    logs_dir = os.path.join(workdir, "logs")
    os.makedirs(logs_dir)
    print(f"[ref_diff] workdir={workdir}")
    gen_corpus(logs_dir, args.lines, seed=args.seed)

    mod = load_reference(workdir)
    ref_df = run_reference(mod, logs_dir)
    print(f"[ref_diff] reference enriched rows: {len(ref_df)}")

    spark_out = os.path.join(workdir, "spark_out")
    run_spark(logs_dir, spark_out, os.path.join(workdir, "geo_cache.parquet"))
    eng_df = pd.read_parquet(os.path.join(spark_out, "featured.parquet"))
    print(f"[ref_diff] engine enriched rows: {len(eng_df)}")

    report, ok = {}, True

    # --- enriched frame (the whole-DAG dataframe) ---
    ref = ref_df.copy()
    ref["log_source_file"] = ref["log_source_file"].map(os.path.basename)
    ref["time_diff"] = ref["time_diff"].dt.total_seconds() * 1e6
    eng = eng_df.copy()
    eng["log_source_file"] = eng["log_source_file"].map(
        lambda p: os.path.basename(str(p)))
    eng = eng.rename(columns={"time_diff_micros": "time_diff"})
    NUM_COLS.add("time_diff")
    ok &= diff_frames("enriched", ref, eng, "trace_id", report)

    # --- cleaned-logs partitioned parquet sink: layout keys per row ---
    def part_keys(base):
        d = pd.read_parquet(base,
                            columns=["trace_id", "request_year", "request_month",
                                     "request_day", "countryCode"])
        for c in d.columns:
            if c != "trace_id":
                d[c] = d[c].astype(str)
        return d
    ok &= diff_frames("cleaned_logs_partitions",
                      part_keys(os.path.join(workdir, "output/cleaned_logs")),
                      part_keys(os.path.join(spark_out, "cleaned_logs")),
                      "trace_id", report)

    # --- hourly aggregates ---
    gkeys = ["request_year", "request_month", "request_day", "request_hour",
             "countryName", "city"]
    rh = pd.read_parquet(os.path.join(
        workdir, "output/aggregated_stats/hourly_traffic_by_geo.parquet"))
    eh = pd.read_parquet(os.path.join(
        spark_out, "aggregated_stats/hourly_traffic_by_geo.parquet"))
    for f in (rh, eh):
        f["_k"] = f[gkeys].astype(str).agg("|".join, axis=1)
    NUM_COLS.update({"request_count", "unique_client_ips_count",
                     "sum_sent_bytes", "sum_received_bytes",
                     "count_2xx", "count_4xx", "count_5xx"})
    FLOAT_COLS.update({"average_total_processing_time",
                       "median_total_processing_time"})
    ok &= diff_frames("hourly_aggregates", rh.drop(columns=gkeys),
                      eh.drop(columns=gkeys), "_k", report)

    # --- error summary CSV ---
    re_ = pd.read_csv(os.path.join(workdir, "output/reports/error_summary_geo.csv"))
    ee = pd.concat([pd.read_csv(p) for p in sorted(glob.glob(os.path.join(
        spark_out, "reports/error_summary_geo.csv/*.csv")))],
        ignore_index=True)
    for f in (re_, ee):
        f["_k"] = f["client_ip"].astype(str) + "|" + canon_ts(f["time"]).astype(str) \
            + "|" + f["full_url"].astype(str)
    ok &= diff_frames("error_summary", re_, ee, "_k", report)

    # --- bot details parquet + origin summary CSV ---
    rb = pd.read_parquet(os.path.join(workdir, "output/reports/bot_traffic_details.parquet"))
    eb = pd.read_parquet(os.path.join(spark_out, "reports/bot_traffic_details.parquet"))
    for f in (rb, eb):
        f["_k"] = f["client_ip"].astype(str) + "|" + canon_ts(f["time"]).astype(str) \
            + "|" + f["full_url"].astype(str)
    ok &= diff_frames("bot_details", rb, eb, "_k", report)

    rs = pd.read_csv(os.path.join(
        workdir, "output/reports/bot_traffic_by_origin_summary.csv"))
    es = pd.concat([pd.read_csv(p) for p in sorted(glob.glob(os.path.join(
        spark_out, "reports/bot_traffic_by_origin_summary.csv/*.csv")))],
        ignore_index=True)
    NUM_COLS.add("bot_request_count")
    for f in (rs, es):
        f["_k"] = f["countryName"].astype(str) + "|" + f["isp"].astype(str)
    ok &= diff_frames("bot_origin_summary", rs, es, "_k", report)

    # --- refreshed geo cache parquet ---
    rc = pd.read_parquet(os.path.join(workdir, "output/ip_geolocation_cache.parquet"))
    rc = rc.reset_index()
    ec = pd.read_parquet(os.path.join(workdir, "geo_cache.parquet"))
    ok &= diff_frames("geo_cache", rc, ec, "client_ip", report)

    summary = {
        "ok": bool(ok),
        "corpus_lines": args.lines,
        "workdir": workdir,
        "excluded_columns": sorted(EXCLUDED),
        "artifacts": {
            k: ("PASS" if "key_mismatch" not in v and
                not any(n for n in v["columns"].values()) else "FAIL")
            for k, v in report.items()},
        "detail": report,
    }
    with open(args.json, "w") as f:
        json.dump(summary, f, indent=1, default=str)
    for k, v in summary["artifacts"].items():
        print(f"[ref_diff] {v}  {k}")
    print(f"[ref_diff] {'CLEAN' if ok else 'DIVERGENT'} -> {args.json}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
