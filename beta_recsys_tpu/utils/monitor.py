"""Resource monitor: daemon thread sampling host CPU/RAM (and device memory stats
when available) during a run.

Reference semantics: beta_rec/utils/monitor.py:11-127 (psutil/GPUtil sampling into
TensorBoard; ``stop()`` returns wall-clock run time used as the ``run_time`` results
column). TPU differences: device stats come from ``jax.local_devices()[i]
.memory_stats()`` when the backend exposes them; TensorBoard writing is optional.
"""

import os
import threading
import time

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None


class Monitor:
    """Sample process/device stats every ``delay`` seconds until stopped."""

    def __init__(self, log_dir=None, delay=1.0, gpu_id=None, writer=None):
        self.delay = delay
        self.log_dir = log_dir
        self.writer = writer  # optional tensorboardX SummaryWriter
        self.samples = []
        self._start_time = time.time()
        self._stop_event = threading.Event()
        self._proc = psutil.Process(os.getpid()) if psutil else None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _device_memory_bytes(self):
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats()
            if stats:
                return stats.get("bytes_in_use", 0)
        except Exception:
            pass
        return 0

    def _run(self):
        step = 0
        while not self._stop_event.wait(self.delay):
            sample = {"t": time.time() - self._start_time}
            if self._proc is not None:
                sample["cpu_percent"] = self._proc.cpu_percent()
                sample["rss_mb"] = self._proc.memory_info().rss / 2**20
            sample["device_mem_mb"] = self._device_memory_bytes() / 2**20
            self.samples.append(sample)
            if self.writer is not None:
                for k, v in sample.items():
                    if k != "t":
                        self.writer.add_scalar(f"device/{k}", v, step)
            step += 1

    def stop(self):
        """Stop sampling; return total wall-clock run time in seconds."""
        self._stop_event.set()
        self._thread.join(timeout=2 * self.delay + 1)
        return time.time() - self._start_time
