#!/bin/bash
# /verify recipe (scaled to session budget): both curves at 2^5,
# CPU-oracle sha equality, determinism + the NEW serve mode (one
# ProverSession serving the same input twice must byte-match the
# oracle on both outputs).
set -x
cd /root/repo
export PYTHONHASHSEED=0
D=$(mktemp -d)

python -m gpu_groth16_prover_3x_tpu generate_parameters \
    --log2-d-4753 5 --log2-d-6753 5 --seed 42 --outdir "$D" || exit 1

for CURVE in MNT4753 MNT6753; do
  python -m gpu_groth16_prover_3x_tpu cpu $CURVE compute \
      $D/$CURVE-parameters $D/$CURVE-input $D/out_cpu_$CURVE || exit 1
  # serve mode: params staged once, TWO proofs of the same input
  timeout 2400 python -m gpu_groth16_prover_3x_tpu tpu $CURVE serve \
      $D/$CURVE-parameters \
      $D/$CURVE-input $D/out_serve0_$CURVE \
      $D/$CURVE-input $D/out_serve1_$CURVE || exit 1
  a=$(sha256sum $D/out_cpu_$CURVE | cut -d' ' -f1)
  b=$(sha256sum $D/out_serve0_$CURVE | cut -d' ' -f1)
  c=$(sha256sum $D/out_serve1_$CURVE | cut -d' ' -f1)
  if [ "$a" == "$b" ] && [ "$b" == "$c" ]; then
    echo "VERIFY $CURVE serve: sha MATCH x3 $a"
  else
    echo "VERIFY $CURVE serve: MISMATCH cpu=$a serve0=$b serve1=$c"
    exit 1
  fi
done

# fail-fast probe: truncated params must fail, not prove
head -c 1000 $D/MNT4753-parameters > $D/truncated
if python -m gpu_groth16_prover_3x_tpu tpu MNT4753 compute \
    $D/truncated $D/MNT4753-input $D/out_bad 2>/dev/null; then
  echo "VERIFY fail-fast: FAILED (truncated params accepted)"; exit 1
else
  echo "VERIFY fail-fast: truncated params rejected OK"
fi
echo "VERIFY ALL GREEN"
