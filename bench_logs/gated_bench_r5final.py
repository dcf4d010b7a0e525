import json, subprocess, sys, time
sys.path.insert(0, "/root/repo/tools")
from scaling_bench import _membw, _membw_one
deadline = time.time() + 3.0 * 3600
hits = 0
while time.time() < deadline and hits < 1:
    p1 = _membw_one(1.0) / 1e9
    if p1 < 5.0:
        time.sleep(20); continue
    p8 = _membw(8, 1.5)
    if p8 < 12.0:
        continue
    out = subprocess.run([sys.executable, "/root/repo/bench.py"],
                         capture_output=True, text=True, cwd="/root/repo", timeout=3600)
    try:
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
    except Exception as e:
        rec = {"err": str(e)[:200]}
    rec["gate_p8"] = round(p8, 1)
    ex = rec.get("extras", {})
    if ex.get("membw_gbps_before", 0) >= 10 and ex.get("membw_gbps_after", 0) >= 10:
        hits += 1
        rec["healthy_both_sides"] = True
    with open("/tmp/gated_bench_r5final.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
print("done")
