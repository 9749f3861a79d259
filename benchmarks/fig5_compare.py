"""Compare recorded spin-chain compilations against the paper's fig5 data.

Reads benchmarks/results_spin_chain.jsonl and lines up, per Trotter time t:
  - CZ/2q depth of our solution vs the paper's table
    (/root/reference/paper/fig5/cz_depth_count.csv: raw Trotter 157-188,
    ADAPT-AQC 28-59, AQC-Tensor 18-21 for n=50, t=0..5),
  - staggered magnetisation of our solution state vs the paper's TDVP
    timeseries and hardware points (tdvp_neel_sm_timeseries.csv,
    experimental_sm_points.csv). Our records store SM as
    (1/n) sum (-1)^i <Z_i> of the X-on-odd-sites Neel; the paper's
    convention ((1/2n), spin-flipped Neel, SM(0) = -0.5) is -0.5x ours.

TIME-UNIT MAPPING (paper tau = 4 x our t): our trotter_circuit evolves the
Pauli-operator XXZ Hamiltonian sum(XX + YY + delta ZZ) + field, while the
paper's figure uses the spin-1/2-operator convention (S = sigma/2, so
H_pauli = 4 H_spin on the bonds). Empirical pin: our n=50 steps1_dt0.2
solution has paper-convention SM = -0.247, matching the TDVP series at
tau = 0.8 = 4 x 0.2 to 0.003 (tdvp_neel_sm_timeseries.csv rows 0.6/-0.345,
0.8/-0.2504, 1.0/-0.1558 — a steep region, so the 4x identification is
tight). Paper depth/SM rows are therefore looked up at tau = 4 x t.

Usage: python benchmarks/fig5_compare.py [--all]
  default: best record (highest overlap) per (n, steps, dt) at n=50;
  --all: every n.
"""

import csv
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
FIG5 = "/root/reference/paper/fig5"


def load_records(all_n=False):
    path = os.path.join(HERE, "results_spin_chain.jsonl")
    best = {}
    if not os.path.exists(path):
        return []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            name = r.get("workload", "")
            if not name.startswith("xxz_trotter_"):
                continue
            try:
                n = int(name.split("_n")[1].split("_")[0])
                steps = int(name.split("_steps")[1].split("_")[0])
                dt = float(name.split("_dt")[1])
            except (IndexError, ValueError):
                continue
            if n != 50 and not all_n:
                continue
            key = (n, steps, dt)
            if key not in best or r["overlap"] > best[key]["overlap"]:
                r["_key"] = key
                best[key] = r
    return [best[k] for k in sorted(best)]


def load_paper_depths():
    out = {}
    with open(os.path.join(FIG5, "cz_depth_count.csv")) as f:
        for row in csv.DictReader(f):
            out.setdefault(float(row["t"]), {})[row["method"]] = (
                int(row["cz_depth"]), int(row["cz_count"]))
    return out


def load_sm_series(fname):
    ts, sms = [], []
    with open(os.path.join(FIG5, fname)) as f:
        for row in csv.DictReader(f):
            ts.append(float(row["t"]))
            sms.append(float(row["staggered_magnetisation"]))
    return ts, sms


def interp(ts, sms, t):
    import numpy as np
    return float(np.interp(t, ts, sms))


def main():
    all_n = "--all" in sys.argv
    records = load_records(all_n)
    if not records:
        print("no spin-chain records" + ("" if all_n else " at n=50")
              + " in results_spin_chain.jsonl")
        return
    depths = load_paper_depths()
    tdvp = load_sm_series("tdvp_neel_sm_timeseries.csv")

    hdr = (f"{'n':>3} {'t':>5} {'ovlp':>7} | {'2q depth':>8} {'2q count':>8} "
           f"| {'paper AQC depth/count':>21} {'raw':>9} | "
           f"{'SM(sol)':>8} {'SM(tdvp)':>8}")
    print(hdr)
    print("-" * len(hdr))
    for r in records:
        n, steps, dt = r["_key"]
        t = steps * dt
        tau = 4.0 * t  # paper time units (see module docstring)
        p = depths.get(tau, {})
        aqc = p.get("ADAPT-AQC")
        raw = p.get("Ran.")
        sm_sol = r.get("sm_solution")
        sm_conv = "" if sm_sol is None else f"{-0.5 * sm_sol:+.3f}"
        sm_ref = f"{interp(*tdvp, tau):+.3f}"
        print(f"{n:>3} {tau:>5.2f} {r['overlap']:>7.4f} | "
              f"{r.get('solution_2q_depth', '?'):>8} "
              f"{r.get('solution_2q_gates', '?'):>8} | "
              f"{str(aqc and f'{aqc[0]}/{aqc[1]}'):>21} "
              f"{str(raw and f'{raw[0]}'):>9} | "
              f"{sm_conv:>8} {sm_ref:>8}")
    print("\npaper rows exist for t in", sorted(depths),
          "(n=50; CZ-basis counts — our solutions count all 2q gates)")


if __name__ == "__main__":
    main()
