#!/bin/bash
# Retry the fat-merge candidates that hung during the main sweep: the
# hangs are nondeterministic and the 4096-row merges are often the
# FASTEST geometry (524288x1 got (512,4096) through on one attempt).
cd /root/repo
python - <<'PYEOF'
import json
p = "/root/.cl_ops_tpu_autotune.json"
d = json.load(open(p))
for shape in ("524288x2", "2097152x2"):
    key = f"TPU_v5_lite:{shape}"
    d.pop(key, None)              # force the sweep to resume
    part = d.get(key + ":partial", {})
    for cand in ("256,4096", "512,4096"):
        if part.get(cand) is None:   # null = hung before; retry
            part.pop(cand, None)
    d[key + ":partial"] = part
json.dump(d, open(p, "w"), indent=1, sort_keys=True)
print("cache prepared:", {k: v for k, v in d.items() if ":partial" in k})
PYEOF
for i in 1 2 3; do
  timeout 1800 python -c "
from cl_ops_tpu.ops.sort.autotune import warm_shapes
warm_shapes([(524288, 2), (2097152, 2)])
print('RETRY WARM OK')
" 2>&1 | grep -v "^WARNING" | tail -1
  if python -c "
import json, sys
d = json.load(open('/root/.cl_ops_tpu_autotune.json'))
sys.exit(0 if 'TPU_v5_lite:524288x2' in d and 'TPU_v5_lite:2097152x2' in d else 1)
  "; then break; fi
  echo "--- retry restart $i ---"
done
python -c "
import json
d = json.load(open('/root/.cl_ops_tpu_autotune.json'))
print({k: v for k, v in d.items() if ':partial' not in k})"
