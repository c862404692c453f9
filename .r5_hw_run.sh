#!/bin/bash
# r5 hardware battery: warm the tuner for every shape the configs sort
# inside jits, then run bench_all one config per process.
cd /root/repo
for i in 1 2 3 4 5 6 7 8 9 10; do
  timeout 1800 python -c "
from cl_ops_tpu.ops.sort.autotune import warm_shapes
warm_shapes([(131072, 1), (131072, 3), (8192, 1), (524288, 1),
             (524288, 2), (2097152, 2)])
print('WARM OK')
" 2>&1 | grep -v "^WARNING" | tail -1
  if python -c "
import json, sys
d = json.load(open('/root/.cl_ops_tpu_autotune.json'))
need = ['131072x1', '131072x3', '8192x1', '524288x1', '524288x2',
        '2097152x2']
sys.exit(0 if all(('TPU_v5_lite:' + k) in d for k in need) else 1)
  "; then echo "ALL SHAPES WARM"; break; fi
  echo "--- warm restart $i ---"
done
python -c "import json; print(json.load(open('/root/.cl_ops_tpu_autotune.json')))"
for cfg in 1 2 3 4 5 6 7 8 9 10 11 12; do
  echo "=== config $cfg ==="
  timeout 2400 python bench_all.py --configs $cfg --tune 2>&1 | grep -v "^WARNING" | tail -4
done
echo "=== BATTERY DONE ==="
cat BENCH_ALL.json
