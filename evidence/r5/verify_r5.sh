#!/bin/bash
# /verify recipe (skill: .claude/skills/verify) — round 5 build.
# CLI pipeline end-to-end at 2^5 for BOTH curves: CPU oracle vs TPU
# prover, radix 16 + default (15 on accelerators) + determinism rerun,
# preprocess/tables path, fail-fast IO.
#
# GOTCHA (this image): setting PYTHONPATH — to anything — disables the
# axon PJRT plugin discovery ("No jax_plugins namespace packages
# available"), so the `tpu` legs must run from /root/repo WITHOUT
# PYTHONPATH; host-only legs (generate/cpu) may use it freely.
set -e
D=$(mktemp -d)
export PYTHONHASHSEED=0
cd /root/repo
python -m gpu_groth16_prover_3x_tpu generate_parameters --log2-d-4753 5 --log2-d-6753 5 --seed 42 --outdir "$D" 2>/dev/null
for C in MNT4753 MNT6753; do
  python -m gpu_groth16_prover_3x_tpu cpu $C compute $D/$C-parameters $D/$C-input $D/out_cpu_$C 2>/dev/null
  GROTH16_FQ_RADIX=16 python -m gpu_groth16_prover_3x_tpu tpu $C compute $D/$C-parameters $D/$C-input $D/out_tpu16_$C 2>/dev/null
  python -m gpu_groth16_prover_3x_tpu tpu $C compute $D/$C-parameters $D/$C-input $D/out_tpu_$C 2>/dev/null
  python -m gpu_groth16_prover_3x_tpu tpu $C compute $D/$C-parameters $D/$C-input $D/out_tpub_$C 2>/dev/null
  a=$(sha256sum $D/out_cpu_$C | cut -d' ' -f1); b=$(sha256sum $D/out_tpu16_$C | cut -d' ' -f1)
  c=$(sha256sum $D/out_tpu_$C | cut -d' ' -f1); d2=$(sha256sum $D/out_tpub_$C | cut -d' ' -f1)
  echo "$C: cpu=$a tpu16=$b tpu_default=$c rerun=$d2"
  [ "$a" = "$b" ] && [ "$a" = "$c" ] && [ "$c" = "$d2" ] && echo "$C MATCH" || { echo "$C MISMATCH"; exit 1; }
done
(cd "$D" && python -m gpu_groth16_prover_3x_tpu cpu MNT4753 preprocess MNT4753-parameters 2>/dev/null) && echo "preprocess OK"
# tables path: preprocess -> prove must byte-match the plain proof
GROTH16_PREPROCESSED_PATH=$D/MNT4753_preprocessed \
python -m gpu_groth16_prover_3x_tpu tpu MNT4753 compute $D/MNT4753-parameters $D/MNT4753-input $D/out_tables 2>/dev/null
t=$(sha256sum $D/out_tables | cut -d' ' -f1); a=$(sha256sum $D/out_cpu_MNT4753 | cut -d' ' -f1)
[ "$a" = "$t" ] && echo "tables MATCH" || { echo "tables MISMATCH"; exit 1; }
# error path: truncated file must fail fast
head -c 1000 $D/MNT4753-parameters > $D/trunc-params
if python -m gpu_groth16_prover_3x_tpu tpu MNT4753 compute $D/trunc-params $D/MNT4753-input $D/out_bad 2>/dev/null; then
  echo "TRUNCATED FILE DID NOT FAIL"; exit 1
else echo "truncated-file fail-fast OK"; fi
echo "VERIFY ALL OK"
