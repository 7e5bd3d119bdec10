"""Parse a --paper_scale run log into PAPER_ROUND.json for bench.py.

Usage: python tools/record_paper_round.py /tmp/paper_round/paper_r2.log

Extracts the per-phase "round N timing" lines the round StepTimer
prints (creamfl_tpu/utils/profiling.py) and records the steady-state
round (the last one, where every program is already compiled) plus the
cold first round, with the run configuration for provenance.
"""

import json
import re
import sys


def parse(path: str):
    rounds = []
    with open(path) as f:
        for line in f:
            m = re.search(r"round (\d+) timing \| (.*)", line)
            if not m:
                continue
            phases = {}
            for part in m.group(2).split():
                key, val = part.split("=")
                phases[key.removesuffix("_s")] = float(val)
            rounds.append({"round": int(m.group(1)), "phases": phases,
                           "total_s": round(sum(phases.values()), 2)})
    return rounds


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "PAPER_ROUND.json"
    rounds = parse(path)
    if not rounds:
        raise SystemExit(f"no 'round N timing' lines in {path}")
    payload = {
        "config": "--synthetic --paper_scale: 50k public set @224px, "
                  "R101+BERT server, 10 clients/round from 10/10/15 "
                  "pools, 5 local epochs, bs64, inter+intra contrast, "
                  "con_w, distill, 25k-caption retrieval eval; images "
                  "synthesized on-device (data/device_synth.py)",
        "cold_round_s": rounds[0]["total_s"],
        "steady_round_s": rounds[-1]["total_s"],
        "steady_phases_s": rounds[-1]["phases"],
        "n_rounds_measured": len(rounds),
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
