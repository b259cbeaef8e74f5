#!/bin/bash
# Render the fresh-split freeze-A/B corpus (seed 20260819) AFTER the flagship
# corpus render finishes (the flagship train phase is TPU-bound; this rides
# the then-idle host core).  Waits on the "corpus rendered" marker in the
# flagship log.
set -euo pipefail
cd /root/repo
while ! grep -q "corpus rendered in\|corpus already present" /tmp/r3_flagship.log; do
  sleep 60
done
python - <<'EOF'
from img2latex_tpu.data.mathtext import write_mathtext_corpus
import time
t0 = time.time()
write_mathtext_corpus(
    "/tmp/freeze_corpus", n_train=8192, n_val=1024, n_test=1024,
    seed=20260819, max_tokens=135, length_profile="im2latex", max_aspect=11.5,
)
print(f"freeze corpus rendered in {time.time() - t0:.0f}s", flush=True)
EOF
echo FREEZE CORPUS DONE
