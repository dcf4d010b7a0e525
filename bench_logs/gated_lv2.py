import json, subprocess, sys, time
sys.path.insert(0, "/root/repo/tools")
from scaling_bench import _membw, _membw_one
corpus = "/root/repo/.work/scaling_corpus"
deadline = time.time() + 2.0 * 3600
hits = 0
while time.time() < deadline and hits < 2:
    p1 = _membw_one(1.0) / 1e9
    if p1 < 5.0:
        time.sleep(15); continue
    p8 = _membw(8, 1.5)
    if p8 < 12.0:
        continue
    t0 = time.time()
    out = subprocess.run([sys.executable, "/root/repo/tools/scaling_job.py",
                          "--cpus", "2", "--corpus", corpus],
                         capture_output=True, text=True, cwd="/root/repo", timeout=3600)
    p8_after = _membw(8, 1.5)
    rec = {"p8_before": round(p8,1), "p8_after": round(p8_after,1),
           "wall": round(time.time()-t0,1)}
    try:
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec.update(json.loads(line))
    except Exception as e:
        rec["err"] = str(e)[:200]
    rec["healthyish"] = p8 >= 12 and p8_after >= 12
    if rec["healthyish"]:
        hits += 1
    with open("/tmp/gated_lv2.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
print("done")
