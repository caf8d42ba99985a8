import os, sys, subprocess, json
variants = ["", "nosample", "nosample,noproc", "nosample,noproc,nohead",
            "nosample,noproc,nohead,noattn", "nosample,noproc,nohead,noattn,nomlp"]
for v in variants:
    env = dict(os.environ, PIE_ABLATE=v)
    r = subprocess.run([sys.executable, "-u", "bench.py"], env=env,
                       capture_output=True, text=True, timeout=2300)
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    print(f"ABLATE[{v or 'none'}]: {line[-1] if line else 'FAILED: ' + r.stderr[-200:]}", flush=True)
