# Atomic chip-session lock (sourced by scripts/chip_session_*.sh).
# mkdir is atomic on POSIX — no TOCTOU between observing the lock free and
# claiming it (the former pid-file wait-then-claim pattern allowed two
# queued sessions to run concurrently).  A stale lock (holder died) is
# detected via the pid recorded inside the lock dir.
#
# Usage:  . scripts/chip_lock.sh && chip_lock_acquire
#         ... chip work ...
#         chip_lock_release   (also runs on EXIT via trap)

CHIP_LOCK_DIR=${CHIP_LOCK_DIR:-/tmp/chip_session.lock}

chip_lock_acquire() {
  while true; do
    if mkdir "$CHIP_LOCK_DIR" 2>/dev/null; then
      echo $$ > "$CHIP_LOCK_DIR/pid"
      trap chip_lock_release EXIT
      return 0
    fi
    holder=$(cat "$CHIP_LOCK_DIR/pid" 2>/dev/null)
    if [ -n "$holder" ] && ! kill -0 "$holder" 2>/dev/null; then
      # stale: holder is gone.  Remove only if the pid file still names the
      # same dead holder (another waiter may have reclaimed in between).
      if [ "$(cat "$CHIP_LOCK_DIR/pid" 2>/dev/null)" = "$holder" ]; then
        rm -rf "$CHIP_LOCK_DIR"
      fi
      continue
    fi
    sleep 30
  done
}

chip_lock_release() {
  if [ "$(cat "$CHIP_LOCK_DIR/pid" 2>/dev/null)" = "$$" ]; then
    rm -rf "$CHIP_LOCK_DIR"
  fi
}
