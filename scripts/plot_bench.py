#!/usr/bin/env python3
"""Benchmark plots — the analog of the reference's plot_results.py
(cooler-MapReduce benchmark_results/plots/), dependency-free: reads the
BENCH_r*.json artifacts (and target/bench_out.json if present) and
hand-writes one SVG with (a) suite wall-clock and query count per
round, (b) the latest round's slowest queries as horizontal bars.

Usage: python3 scripts/plot_bench.py [outfile.svg]
Truncated artifacts (tail-captured stdout) are skipped with a note.
"""
import glob, json, os, re, sys


def parse_artifact(d):
    """Extract (wall_sec, {query: sec}) from a BENCH artifact.

    target/bench_out.json is the bench main's own full JSON
    ({value, queries, ...}). The driver's BENCH_r*.json artifacts
    instead wrap the run as {n, rc, cpus, sf, tail} where `tail` is
    the LAST 2000 chars of captured stdout — usually truncated at the
    head, so the {"metric": ... prefix (and often "value") is gone but
    the queries map at the end survives. Recover what's there.
    """
    if "value" in d or "queries" in d:
        return d.get("value"), d.get("queries", {})
    tail = d.get("tail", "")
    # intact JSON line inside the tail?
    m = re.search(r'\{"metric".*?"sf":[^}]*\}', tail)
    if m:
        try:
            j = json.loads(m.group(0))
            return j.get("value"), j.get("queries", {})
        except json.JSONDecodeError:
            pass
    # head-truncated: the "name":sec pairs up to the closing brace of
    # the queries map are still the only float pairs in the tail
    qsec = tail.split('"queries":{')[-1]
    qsec = re.split(r'}\s*,\s*"(?:failed|sf)"', qsec)[0]
    queries = {k: float(v) for k, v in
               re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', qsec)}
    wall = queries.pop("value", None)
    if wall is None:
        # fall back to sbt's own total (includes JVM startup — coarse)
        t = re.search(r"Total time: (\d+) s", tail)
        wall = float(t.group(1)) if t else None
    return wall, queries


def load_rounds():
    rounds = []
    for path in sorted(glob.glob("BENCH_r*.json")) + ["target/bench_out.json"]:
        if not os.path.exists(path):
            continue
        try:
            with open(path) as f:
                d = json.load(f)
            wall, queries = parse_artifact(d)
            if wall is None and not queries:
                print(f"  [skip] {path}: truncated/unparseable", file=sys.stderr)
                continue
            label = re.search(r"r(\d+)", path)
            rounds.append({
                "label": f"r{int(label.group(1))}" if label else "now",
                "wall": wall,
                "queries": queries,
            })
        except (json.JSONDecodeError, ValueError):
            print(f"  [skip] {path}: truncated/unparseable", file=sys.stderr)
    return rounds


def svg(rounds, out):
    W, H, PAD = 900, 640, 50
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
             f'font-family="monospace" font-size="12">',
             f'<rect width="{W}" height="{H}" fill="white"/>',
             f'<text x="{PAD}" y="24" font-size="16">graft bench — suite wall per round '
             f'(top), slowest queries latest round (bottom)</text>']
    # ---- panel 1: wall seconds + query count per round ----
    # Driver-host contention can inflate a round's wall uniformly (r6:
    # 334 s vs a 25-35 s envelope with zero code changes). A contended
    # round is an artifact, not a regression — flag any wall > 3x the
    # cross-round median, plot it hatched at the clipped height, and
    # scale the axis to the in-envelope rounds so one polluted run
    # doesn't flatten the real history.
    p1h = 200
    walls = [(r["label"], r["wall"], len(r["queries"])) for r in rounds if r["wall"]]
    if walls:
        med = sorted(w for _, w, _ in walls)[len(walls) // 2]
        ok = [w for _, w, _ in walls if w <= 3 * med]
        wmax = max(ok) if ok else max(w for _, w, _ in walls)
        bw = min(80, (W - 2 * PAD) // max(len(walls), 1))
        for i, (lab, w, nq) in enumerate(walls):
            contended = w > 3 * med
            x = PAD + i * (bw + 14)
            h = int((min(w, wmax) / wmax) * (p1h - 30))
            y = 40 + (p1h - 30) - h
            fill = "#c8c8c8" if contended else "#4878a8"
            parts.append(f'<rect x="{x}" y="{y}" width="{bw}" height="{h}" fill="{fill}"/>')
            note = f'{w:.1f}s' + (' (contended)' if contended else '')
            parts.append(f'<text x="{x + bw // 2}" y="{y - 4}" text-anchor="middle">'
                         f'{note}</text>')
            parts.append(f'<text x="{x + bw // 2}" y="{40 + p1h - 12}" text-anchor="middle">'
                         f'{lab} ({nq}q)</text>')
    # ---- panel 2: slowest queries, latest complete round ----
    latest = next((r for r in reversed(rounds) if r["queries"]), None)
    if latest:
        top = sorted(latest["queries"].items(), key=lambda kv: -kv[1])[:18]
        tmax = top[0][1]
        y0 = 40 + p1h + 30
        parts.append(f'<text x="{PAD}" y="{y0 - 8}">{latest["label"]}: slowest queries '
                     f'(sec, overlapped pool)</text>')
        for i, (name, sec) in enumerate(top):
            y = y0 + i * 19
            w = int((sec / tmax) * (W - 2 * PAD - 240))
            parts.append(f'<rect x="{PAD + 220}" y="{y}" width="{w}" height="14" fill="#b04838"/>')
            parts.append(f'<text x="{PAD + 214}" y="{y + 11}" text-anchor="end">{name}</text>')
            parts.append(f'<text x="{PAD + 226 + w}" y="{y + 11}">{sec:.2f}</text>')
    parts.append("</svg>")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {out} ({len(rounds)} rounds)")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "target/bench_plot.svg"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    rounds = load_rounds()
    if not rounds:
        sys.exit("no parseable BENCH artifacts found")
    svg(rounds, out)
