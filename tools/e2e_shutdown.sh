#!/usr/bin/env bash
# End-to-end validation of the two-phase SIGTERM shutdown + checkpoint
# replay on the REAL binary (r11; reference Collector.scala:206-233):
#
#   1. start `CollectorMain --http` with preTerminationPeriod=2s,
#      preTerminationUnhealthy=true, terminationDeadline=5s;
#   2. send live pixel + tp2 traffic; /health must be 200;
#   3. SIGTERM: /health must flip to 503 for the WHOLE drain window and
#      the process must exit inside the deadline;
#   4. restart on the same spool/checkpoint: the interrupted micro-batch
#      must REPLAY the spooled events into the good leg (verified with
#      DuckDB), then a second SIGTERM must exit cleanly again.
#
# Usage: tools/e2e_shutdown.sh   (after `sbt compile`; needs /opt/spark/jars)
set -u
DIR=$(mktemp -d /tmp/graft-e2e.XXXXXX)
trap 'pkill -9 -f "graft-e2e-marker" 2>/dev/null; rm -rf "$DIR"' EXIT
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
cat > "$DIR/cfg.hocon" <<'EOF'
collector {
  interface = "127.0.0.1"
  port = 0
  preTerminationPeriod = 2 seconds
  preTerminationUnhealthy = true
  terminationDeadline = 5 seconds
}
EOF
fail() { echo "FAIL: $1"; exit 1; }

start() { # -> $PID, $PORT
  SPARK_GRAFT_CPUS=4 java -Dgraft-e2e-marker -cp "$CP" graft.CollectorMain \
    --http --config "$DIR/cfg.hocon" \
    "$DIR/spool" "$DIR/good" "$DIR/bad" "$DIR/ckpt" 1000 \
    > "$DIR/run.log" 2>&1 &
  PID=$!
  for i in $(seq 1 60); do
    PORT=$(sed -n 's/.*listening on http:\/\/127.0.0.1:\([0-9]*\).*/\1/p' "$DIR/run.log" | head -1)
    [ -n "${PORT:-}" ] && break
    sleep 1
  done
  [ -n "${PORT:-}" ] || fail "server never reported its port"
}
code() { curl -s -o /dev/null -w "%{http_code}" --max-time 3 "http://127.0.0.1:$PORT$1"; }

start
[ "$(code '/health')" = 200 ] || fail "/health not 200 at startup"
[ "$(code '/i?e=pv&aid=e2e')" = 200 ] || fail "pixel not served"
[ "$(curl -s -o /dev/null -w '%{http_code}' -X POST -H 'Content-Type: application/json' \
  -d '{"schema":"iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4","data":[{"e":"pv","aid":"e2e","p":"web"}]}' \
  "http://127.0.0.1:$PORT/com.snowplowanalytics.snowplow/tp2")" = 200 ] || fail "tp2 not accepted"
kill -TERM "$PID"
sleep 0.3
[ "$(code '/health')" = 503 ] || fail "/health not 503 during the drain"
sleep 1.2
[ "$(code '/health')" = 503 ] || fail "/health flipped back mid-drain"
for i in $(seq 1 15); do ps -p "$PID" >/dev/null || break; sleep 1; done
ps -p "$PID" >/dev/null && fail "process outlived the termination deadline"
echo "phase 1 OK: 200 -> SIGTERM -> 503 through the drain -> bounded exit"

start # same spool + checkpoint: the interrupted batch must replay
for i in $(seq 1 45); do
  n=$(python3 - "$DIR" <<'PY' 2>/dev/null
import sys, glob, duckdb
files = glob.glob(sys.argv[1] + "/good/*.parquet")
print(duckdb.connect().execute(
  f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0)
PY
)
  [ "${n:-0}" -ge 2 ] && break
  sleep 1
done
[ "${n:-0}" -ge 2 ] || fail "checkpoint replay never drained the spooled events (got ${n:-0})"
kill -TERM "$PID"
for i in $(seq 1 15); do ps -p "$PID" >/dev/null || break; sleep 1; done
ps -p "$PID" >/dev/null && fail "second shutdown hung"
echo "phase 2 OK: restart replayed $n spooled events into the good leg, clean exit"
echo "E2E SHUTDOWN/REPLAY: PASS"
