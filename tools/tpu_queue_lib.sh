# Shared helper for the sequential TPU work queues
# (tools/tpu_queue_runner.sh, tools/tpu_queue_post.sh).  Source after
# setting L to the log dir.
#
# run NAME TIMEOUT CMD...: run one queue item bounded by `timeout`,
# logging to $L/NAME.log.  A .done marker makes re-runs idempotent
# (crash-resume: finished items are skipped); failures (including
# timeout's rc=124) leave no marker and don't abort the queue.

run() {
  name=$1; tmo=$2; shift 2
  if [ -f "$L/$name.done" ]; then
    echo "=== [$name] already done, skipping ==="
    return
  fi
  echo "=== [$name] start $(date) ==="
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== [$name] exit=$rc $(date) ==="
  [ "$rc" -eq 0 ] && touch "$L/$name.done"
  tail -5 "$L/$name.log"
}
