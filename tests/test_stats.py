import time

from ihmr_tpu.train.stats import AverageMeter, LossStat, OptTimeStat, TimeStat
from ihmr_tpu.train.profiling import StepTimer


class TestMeters:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0
        m.update(5.0, n=2)
        assert m.avg == (1 + 3 + 10) / 4

    def test_loss_stat_prints(self, capsys):
        ls = LossStat(num_batches=10)
        ls.set_epoch(3)
        ls.update({"total_loss": 1.5, "joints_2d_loss": 0.5})
        ls.print_loss(2)
        out = capsys.readouterr().out
        assert "epoch:003" in out and "total_loss:1.5000" in out

    def test_time_stat(self, capsys):
        ts = TimeStat(total_epoch=2, stage_id=1)
        ts.epoch_init(1)
        ts.stat_data_time()
        ts.stat_forward_time()
        ts.stat_visualize_time()
        ts.print_stat()
        assert "stage:01" in capsys.readouterr().out

    def test_opt_time_stat_throughput(self, capsys):
        ts = OptTimeStat(iter_total=2, samples_per_iter=100)
        ts.opt_iter_start()
        time.sleep(0.01)
        ts.opt_iter_end()
        ts.print_stat()
        out = capsys.readouterr().out
        assert "hands/sec" in out
        assert ts.hands_per_sec > 0
        ts.print_stat(opt_complete=True)
        assert "total time cost" in capsys.readouterr().out

    def test_step_timer_skips_warmup(self):
        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                time.sleep(0.002)
        assert len(t.times) == 2
        assert t.best <= t.mean
