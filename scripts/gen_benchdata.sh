#!/bin/bash
# Rebuild the scaling-benchdata chain with two-level GenScale:
#   sf1   = sf0.1 x10 (shift 1e8, tag r)
#   sf10  = sf1  x10 (shift 1e9, tag s)
#   sf100 = sf10 x10 (shift 1e10, tag t)
# Distinct tag per LEVEL (see GenScale.scala suffix-collision notes).
set -euo pipefail
cd /root/repo
sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 benchdata/sf1 10 100000000 r" 2>&1 | grep -E "genscale|error" || true
sbt -batch "runMain graft.GenScale benchdata/sf1 benchdata/sf10 10 1000000000 s" 2>&1 | grep -E "genscale|error" || true
sbt -batch "runMain graft.GenScale benchdata/sf10 benchdata/sf100 10 10000000000 t" 2>&1 | grep -E "genscale|error" || true
du -sh benchdata/*
