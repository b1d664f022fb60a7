"""Peak-anonymous-RSS profiler (reference script/rss_anon.py:20-31): run a
command and poll /proc/<pid>/status RssAnon, printing the peak in kB.

Usage: python scripts/rss_anon.py -- python -m sshash_tpu build -i ... -k 31 -m 15
"""

import json
import re
import subprocess
import sys
import time

PAT = re.compile(rb"RssAnon:\s+(\d+)\s+kB")


def peak_rss_anon(cmd):
    proc = subprocess.Popen(cmd)
    peak = 0
    while proc.poll() is None:
        try:
            with open(f"/proc/{proc.pid}/status", "rb") as f:
                m = PAT.search(f.read())
            if m:
                peak = max(peak, int(m.group(1)))
        except FileNotFoundError:
            break
        time.sleep(0.05)
    return proc.returncode, peak


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == "--":
        argv = argv[1:]
    if not argv:
        print("usage: rss_anon.py -- <command...>", file=sys.stderr)
        return 2
    rc, peak = peak_rss_anon(argv)
    print(json.dumps({"cmd": " ".join(argv), "returncode": rc,
                      "peak_rss_anon_kb": peak}))
    return rc


if __name__ == "__main__":
    sys.exit(main())
