#!/usr/bin/env bash
# Cross-process commit smoke: two SEPARATE JVMs race appends to one
# TableStore table; a third verifies every snapshot landed (no lost
# commit, no GC of an in-flight snapshot, no duplicated batch).
# ConcurrentCommitSpec covers same-JVM races; this is the only place the
# claim primitive's cross-process atomicity (link(2) putIfAbsent) and the
# gcGraceMs cross-process guard run for real.
#
# Usage: scripts/two_writer_smoke.sh [nCommitsPerWriter]   (default 12)
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:-12}"
ROOT="$(mktemp -d /tmp/graft_2jvm.XXXXXX)"
trap 'rm -rf "$ROOT"' EXIT

# compile once so the raced JVMs start from bytecode, not from sbt
sbt -batch "compile" >/dev/null

# resolve the Spark jars dir from the environment, not a hardcoded layout
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
if [ ! -d "$SPARK_JARS" ]; then
  echo "ERROR: Spark jars not found at $SPARK_JARS — set SPARK_HOME" >&2
  exit 1
fi
CLASSES_DIR="$(ls -d target/scala-*/classes 2>/dev/null | head -1)"
if [ -z "$CLASSES_DIR" ]; then
  echo "ERROR: no compiled classes under target/scala-*/classes" >&2
  exit 1
fi
CP="$CLASSES_DIR:$SPARK_JARS/*"
ADD_OPENS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
)
JAVA_FLAGS=("${ADD_OPENS[@]}" -Xmx2g -Dspark.ui.enabled=false
  -Dspark.sql.session.timeZone=UTC)

run() { java "${JAVA_FLAGS[@]}" -cp "$CP" graft.tools.TwoWriterSmoke "$@"; }

echo "[2jvm] racing two writer JVMs, $N commits each, root=$ROOT"
run write "$ROOT" t A "$N" >"$ROOT/a.log" 2>&1 &
PID_A=$!
run write "$ROOT" t B "$N" >"$ROOT/b.log" 2>&1 &
PID_B=$!
wait "$PID_A" || { echo "[2jvm] writer A FAILED"; tail -20 "$ROOT/a.log"; exit 1; }
wait "$PID_B" || { echo "[2jvm] writer B FAILED"; tail -20 "$ROOT/b.log"; exit 1; }
grep -h WRITER_DONE "$ROOT/a.log" "$ROOT/b.log"

# every batch is 10 rows; both writers' every commit must be visible
run verify "$ROOT" t "$((2 * N * 10))" 2 2>&1 | grep VERIFY_OK
echo "[2jvm] OK: all $((2 * N)) cross-process commits landed"

# ---- partitioned leg: two JVMs race hive-partitioned CAS appends, a
# THIRD process drops day partitions from the manifest those JVMs built,
# and a FOURTH (cold caches) verifies the survivors — include/exclusion
# subset entries must round-trip across processes, not just in-memory.
# Row math assumes N % 4 == 0 (each day-residue hit equally often).
if [ $((N % 4)) -eq 0 ]; then
  echo "[2jvm] partitioned leg: racing writers, then cross-process drop"
  run writep "$ROOT" tp A "$N" >"$ROOT/pa.log" 2>&1 &
  PID_A=$!
  run writep "$ROOT" tp B "$N" >"$ROOT/pb.log" 2>&1 &
  PID_B=$!
  wait "$PID_A" || { echo "[2jvm] partitioned writer A FAILED"; tail -20 "$ROOT/pa.log"; exit 1; }
  wait "$PID_B" || { echo "[2jvm] partitioned writer B FAILED"; tail -20 "$ROOT/pb.log"; exit 1; }
  run drop "$ROOT" tp d0,d1 2>&1 | grep DROP_DONE
  # per writer: d0=5N/4, d1..d3=10N/4, d4=5N/4 rows; dropping d0,d1
  # keeps 10N - 15N/4 per writer
  KEPT_ROWS=$((2 * (10 * N - 15 * N / 4)))
  run verifyp "$ROOT" tp "$KEPT_ROWS" 2 d2,d3,d4 2>&1 | grep VERIFYP_OK
  echo "[2jvm] OK: partitioned appends + cross-process drop verified"
fi

# ---- lease leg: two JVMs race the SAME retention-lease acquire through
# a file barrier (both attempt before either releases) — exactly one may
# win; afterwards a single acquire must succeed (the winner released).
echo "[2jvm] lease leg: racing two JVMs for one retention lease"
run lease "$ROOT" tl A 2 >"$ROOT/la.log" 2>&1 &
PID_A=$!
run lease "$ROOT" tl B 2 >"$ROOT/lb.log" 2>&1 &
PID_B=$!
wait "$PID_A" || { echo "[2jvm] lease racer A FAILED"; tail -20 "$ROOT/la.log"; exit 1; }
wait "$PID_B" || { echo "[2jvm] lease racer B FAILED"; tail -20 "$ROOT/lb.log"; exit 1; }
grep -h LEASE_RESULT "$ROOT/la.log" "$ROOT/lb.log"
WINS=$(grep -h "LEASE_RESULT" "$ROOT/la.log" "$ROOT/lb.log" | grep -c "won=true" || true)
if [ "$WINS" -ne 1 ]; then
  echo "[2jvm] lease race FAILED: $WINS winners (must be exactly 1)"
  exit 1
fi
run lease "$ROOT" tl C 1 >"$ROOT/lc.log" 2>&1 \
  || { echo "[2jvm] post-race acquire FAILED"; tail -20 "$ROOT/lc.log"; exit 1; }
grep -q "LEASE_RESULT C won=true" "$ROOT/lc.log" \
  || { echo "[2jvm] post-race acquire must win a released lease"; exit 1; }
echo "[2jvm] OK: exactly one cross-process lease winner; released cleanly"

# ---- chaos leg: a cascade JVM is KILLED (halt 137, a SIGKILL stand-in)
# mid-erasure at the committed-mark window — deletion vector landed, BM25
# negation not. A second JVM must (a) fail to drain while the dead
# holder's lease is inside its declared ttl, (b) take over past the
# holder's own deadline, (c) drain the journal, (d) leave the index equal
# to a fresh rebuild over the survivors. This ties lease takeover and
# journal drain together across REAL process death — in-JVM specs cover
# the same windows but share a process.
# ttl sized to cover the second JVM's Spark startup (~20-30s): its FIRST
# drain attempt must land while the dead lease is still fresh.
CHAOS_TTL=90000
echo "[2jvm] chaos leg: killing a cascade mid-erasure, then takeover+drain"
RC=0
run cascade_kill "$ROOT" tc "$CHAOS_TTL" >"$ROOT/ck.log" 2>&1 || RC=$?
if [ "$RC" -ne 137 ]; then
  echo "[2jvm] cascade_kill must halt with 137, got $RC"; tail -20 "$ROOT/ck.log"; exit 1
fi
grep -q "CASCADE_KILLED at committed-mark" "$ROOT/ck.log" \
  || { echo "[2jvm] kill window never reached"; tail -20 "$ROOT/ck.log"; exit 1; }
run takeover_drain "$ROOT" tc "$CHAOS_TTL" >"$ROOT/td.log" 2>&1 \
  || { echo "[2jvm] takeover_drain FAILED"; tail -30 "$ROOT/td.log"; exit 1; }
grep -h "DRAIN_BLOCKED\|TAKEOVER_DRAIN_OK" "$ROOT/td.log"
grep -q "TAKEOVER_DRAIN_OK" "$ROOT/td.log" \
  || { echo "[2jvm] takeover_drain never confirmed"; exit 1; }
echo "[2jvm] OK: dead operator's lease honored until its ttl, then taken over; journal drained == fresh rebuild"
