"""Training/runtime telemetry counters (ref src/utils/train_utils.py and
src/utils/opt_utils.py:14-42): running loss averages, epoch time splits, and
the OPT throughput/ETA printer — the reference's only perf telemetry surface.
For deep profiling use jax.profiler traces (see ihmr_tpu.train.profiling)."""

from __future__ import annotations

import time
from collections import OrderedDict
from datetime import datetime
from typing import Dict, Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


LOSS_NAMES = (
    "hand_type_loss",
    "joints_2d_loss",
    "joints_3d_loss",
    "mano_pose_loss",
    "mano_shape_loss",
    "hand_trans_loss",
    "shape_reg_loss",
    "collision_loss",
    "total_loss",
)


class LossStat:
    """Named running averages printed every print_freq samples
    (ref train_utils.py:44-93)."""

    def __init__(self, num_batches: int, names=LOSS_NAMES):
        self.num_batches = num_batches
        self.meters: "OrderedDict[str, AverageMeter]" = OrderedDict(
            (name, AverageMeter()) for name in names
        )

    def update(self, losses: Dict[str, float], n: int = 1):
        for name, meter in self.meters.items():
            if name in losses:
                meter.update(float(losses[name]), n)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        for meter in self.meters.values():
            meter.reset()

    def print_loss(self, batch_idx: int):
        parts = [f"epoch:{getattr(self, 'epoch', 0):03d}, iter:{batch_idx}/{self.num_batches}"]
        parts += [f"{name}:{m.avg:.4f}" for name, m in self.meters.items() if m.count]
        print("  ".join(parts), flush=True)


class TimeStat:
    """Epoch time split into data/forward/visualize (ref train_utils.py:96-147)."""

    def __init__(self, total_epoch: int = 0, stage_id: int = -1):
        self.total_epoch = total_epoch
        self.stage_id = stage_id
        self.data_time = self.forward_time = self.vis_time = 0.0

    def epoch_init(self, epoch: int):
        self.epoch = epoch
        self.start = time.time()
        self.data_time = self.forward_time = self.vis_time = 0.0
        self._mark = self.start

    def stat_data_time(self):
        now = time.time()
        self.data_time += now - self._mark
        self._mark = now

    def stat_forward_time(self):
        now = time.time()
        self.forward_time += now - self._mark
        self._mark = now

    def stat_visualize_time(self):
        now = time.time()
        self.vis_time += now - self._mark
        self._mark = now

    def print_stat(self):
        total = time.time() - self.start
        stage = f"stage:{self.stage_id:02d}, " if self.stage_id >= 0 else ""
        print(
            f"{stage}epoch:{self.epoch:03d} time {total:.1f}s "
            f"(data {self.data_time:.1f}s, forward {self.forward_time:.1f}s, "
            f"vis {self.vis_time:.1f}s)",
            flush=True,
        )


class OptTimeStat:
    """Per-iteration wall-clock + throughput + ETA for the OPT runner
    (ref src/utils/opt_utils.py:14-42)."""

    def __init__(self, iter_total: int, samples_per_iter: Optional[int] = None):
        self.iter_total = iter_total
        self.samples_per_iter = samples_per_iter
        self.iter_count = 0
        self.total_time = 0.0

    def opt_iter_start(self):
        self._start = time.time()

    def opt_iter_end(self):
        self.iter_time = time.time() - self._start
        self.total_time += self.iter_time
        self.iter_count += 1

    @property
    def hands_per_sec(self) -> Optional[float]:
        if self.samples_per_iter is None or self.total_time == 0:
            return None
        return self.iter_count * self.samples_per_iter / self.total_time

    def print_stat(self, opt_complete: bool = False):
        if not opt_complete:
            speed = self.iter_count / self.total_time
            remain = (self.iter_total - self.iter_count) / max(speed, 1e-9)
            line = (
                f"Opt completes: {self.iter_count}/{self.iter_total}, "
                f"iter time: {self.iter_time:.2f} sec, remain requires: {remain / 60:.2f} mins"
            )
            if self.hands_per_sec is not None:
                line += f", throughput: {self.hands_per_sec:.2f} hands/sec"
            print(line, flush=True)
            print("-------------------------------------------", flush=True)
        else:
            now = datetime.now().strftime("%Y-%m-%d:%H:%M:%S")
            print(
                f"Opt completes in {now}, total time cost: "
                f"{self.total_time / 60:.3f} mins ({self.total_time / 3600:.3f} hours)",
                flush=True,
            )
