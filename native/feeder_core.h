// Shared feeder protocol: bounded sample queue + worker thread pool +
// per-pass dead-shard accounting.  Used by both native feeders (the
// feature feeder in vox_feeder.cc and the raw-audio feeder in
// vox_raw.cc) so the subtle parts -- lost-wakeup-safe stop, contiguous
// shard split, 10%-skip reshuffle (ref tf_data.py:69), complete-pass-only
// dead-worker detection, all-dead loud failure -- exist exactly once.
//
// Protocol (mirrors the reference's bounded feeder queues,
// ref tf_train_tdnn.py:151-164):
//   * each worker owns a contiguous slice of the entry list
//   * produce(i, rng, &sample) decodes entry i; false counts a decode
//     error and moves on
//   * a COMPLETE pass with attempts > 0 and zero successes marks the
//     worker dead (one dead worker == one silently missing data shard;
//     callers surface it via dead_workers).  When ALL workers are dead,
//     `failed` is set so pop() returns -2 instead of blocking forever.
//   * stop() stores the flag under the queue mutex so a waiter that just
//     evaluated its predicate cannot miss the notification.

#ifndef VOX_FEEDER_CORE_H_
#define VOX_FEEDER_CORE_H_

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

template <typename Sample>
struct FeederCore {
  std::deque<Sample> q;
  std::mutex mu;
  std::condition_variable cv_space, cv_items;
  size_t cap = 0;
  std::atomic<bool> stop{false};
  std::atomic<bool> failed{false};  // every worker's shard is dead
  std::atomic<int> dead_workers{0};
  int n_workers = 0;
  std::atomic<int64_t> decode_errors{0};
  std::vector<std::thread> workers;

  // Worker body: iterate this worker's contiguous shard forever (with the
  // per-pass skip reshuffle), pushing produced samples into the bounded
  // queue.  ProduceFn: bool(size_t index, std::mt19937_64& rng, Sample*).
  template <typename ProduceFn>
  void worker_loop(size_t widx, size_t nworkers, size_t n_entries,
                   uint64_t seed, int32_t skip_percent, ProduceFn produce) {
    std::mt19937_64 rng(seed * 0x9e3779b97f4a7c15ull + widx);
    const size_t lo = n_entries * widx / nworkers;
    const size_t hi = n_entries * (widx + 1) / nworkers;
    if (lo >= hi) return;
    while (!stop.load(std::memory_order_relaxed)) {
      size_t attempts = 0, pushed = 0;
      for (size_t i = lo; i < hi && !stop.load(std::memory_order_relaxed);
           ++i) {
        if (skip_percent > 0 &&
            (int32_t)(rng() % 100) >= 100 - skip_percent)
          continue;  // per-pass reshuffle (ref tf_data.py:69)
        ++attempts;
        Sample s;
        if (!produce(i, rng, &s)) {
          decode_errors.fetch_add(1);
          continue;
        }
        ++pushed;
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return q.size() < cap || stop.load(); });
        if (stop.load()) return;
        q.push_back(std::move(s));
        cv_items.notify_one();
      }
      // dead shard -- but only from a COMPLETE pass: a stop() mid-pass
      // must not count a healthy shard whose successes were still ahead
      if (!stop.load(std::memory_order_relaxed) &&
          attempts > 0 && pushed == 0) {
        if (dead_workers.fetch_add(1) + 1 >= n_workers) {
          {
            std::lock_guard<std::mutex> lk(mu);
            failed.store(true);
          }
          cv_items.notify_all();
        }
        return;
      }
    }
  }

  // Blocking pop: 0 = sample written, -1 = stopped, -2 = all shards dead.
  int pop(Sample* out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_items.wait(lk, [&] {
      return !q.empty() || stop.load() || failed.load();
    });
    if (q.empty()) return failed.load() && !stop.load() ? -2 : -1;
    *out = std::move(q.front());
    q.pop_front();
    cv_space.notify_one();
    return 0;
  }

  void request_stop() {
    {
      // store under the queue mutex: a waiter that just evaluated its
      // predicate cannot miss the flag + notification (lost wakeup)
      std::lock_guard<std::mutex> lk(mu);
      stop.store(true);
    }
    cv_space.notify_all();
    cv_items.notify_all();
  }

  void join_all() {
    for (auto& t : workers) t.join();
  }
};

#endif  // VOX_FEEDER_CORE_H_
