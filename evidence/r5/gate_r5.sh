#!/bin/bash
# Round-5 hardware sha gates: the restructured prover (pre-kernel staging,
# device-resident streamed MSM, radix-15 default, canon-merged scan step)
# must reproduce the recorded CPU-oracle shas byte-for-byte.
# Golden shas (CPU oracle outputs in .bench_cache, rounds 3-4):
#   MNT4753 2^16: 784ae650d483e2a342d21cd24d107a04c1ef053bbca0ea2bf028146bc0885ca9
#   MNT6753 2^15: c0ad19336311aa89c55400325a1987a096c97c966cf6c4a5478cf27c77b078d0
#   MNT4753 2^20: 29d3ff7c393082673787514db8fd716bcee72d02f03261762a856cdca3bb7468
set -x
cd /root/repo
export PYTHONHASHSEED=0      # stable compile-cache keys (BASELINE round 5)
B=.bench_cache

gate() {  # gate <curve> <params> <input> <out> <golden>
  timeout 4000 python -m gpu_groth16_prover_3x_tpu tpu "$1" compute "$2" "$3" "$4" || return 1
  got=$(sha256sum "$4" | cut -d' ' -f1)
  if [ "$got" == "$5" ]; then echo "GATE $1 $4: sha MATCH $got"
  else echo "GATE $1 $4: sha MISMATCH got=$got want=$5"; return 1; fi
}

gate MNT4753 $B/MNT4753-parameters-16 $B/MNT4753-input-16 $B/MNT4753-output-16.r5 \
  784ae650d483e2a342d21cd24d107a04c1ef053bbca0ea2bf028146bc0885ca9
gate MNT6753 $B/MNT6753-parameters-15 $B/MNT6753-input-15 $B/MNT6753-output-15.r5 \
  c0ad19336311aa89c55400325a1987a096c97c966cf6c4a5478cf27c77b078d0
