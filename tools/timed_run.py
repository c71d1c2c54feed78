"""Run a command; write the child tree's peak RSS (GB) to argv[1].
(/usr/bin/time is not in this image.)"""
import resource
import subprocess
import sys

rss_file, cmd = sys.argv[1], sys.argv[2:]
rc = subprocess.call(cmd)
peak_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
with open(rss_file, "w") as f:
    f.write(f"{peak_kb / 1048576:.1f}")
sys.exit(rc)
