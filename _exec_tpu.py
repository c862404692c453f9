import subprocess, sys
for args in (["--op","filter","-n","24","-r","5"],
             ["--op","aggregate","-n","24","--groups","1048576","-r","5"],
             ["--op","join","-n","24","--dim-log2","20","-r","5"],
             ["--op","join","-n","24","--dim-log2","20","--zipf","1.3","-r","5"]):
    r = subprocess.run([sys.executable,"-m","cl_ops_tpu.bench.exec_bench"]+args,
                       capture_output=True, text=True, timeout=560)
    print(r.stdout.strip() or r.stderr.strip()[-200:], flush=True)
