/**
 * Async mutual exclusion for the heybuddy-tpu browser runtime.
 *
 * Reference parity: src/ts/src/mutex.ts (a promise-chain MutexLock). This
 * implementation is queue-based instead: waiters resolve strictly FIFO, a
 * `locked` probe is available, and `runExclusive` scopes the critical
 * section so a thrown callback can never leak a held lock.
 *
 * Usage:
 *   const lock = new MutexLock();
 *   const release = await lock.acquire();
 *   try { ... } finally { release(); }
 * or:
 *   await lock.runExclusive(async () => { ... });
 */

export class MutexLock {
  constructor() {
    this._held = false;
    this._waiters = [];
  }

  /** Whether the lock is currently held. */
  get locked() {
    return this._held;
  }

  /** Number of pending acquirers (excluding the holder). */
  get pending() {
    return this._waiters.length;
  }

  /**
   * Acquire the lock. Resolves with an idempotent release function once the
   * lock is held; callers queue FIFO.
   *
   * @returns {Promise<() => void>}
   */
  acquire() {
    return new Promise((resolve) => {
      const grant = () => {
        this._held = true;
        let released = false;
        resolve(() => {
          if (released) return;
          released = true;
          this._release();
        });
      };
      if (this._held) {
        this._waiters.push(grant);
      } else {
        grant();
      }
    });
  }

  /**
   * Run `fn` while holding the lock, releasing it on return or throw.
   *
   * @param {() => (Promise<any>|any)} fn
   * @returns {Promise<any>} `fn`'s result.
   */
  async runExclusive(fn) {
    const release = await this.acquire();
    try {
      return await fn();
    } finally {
      release();
    }
  }

  _release() {
    const next = this._waiters.shift();
    if (next) {
      // Hand off directly: the lock stays held, the next waiter owns it.
      next();
    } else {
      this._held = false;
    }
  }
}

export default MutexLock;
