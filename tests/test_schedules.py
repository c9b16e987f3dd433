"""LR-schedule parity vs torch schedulers (the reference's get_scheduler,
models/networks.py:22-49)."""
import numpy as np
import pytest
import torch

from dahitra_tpu.train.optim import (LEVIR_MULTISTEP_MILESTONES,
                                     XBD_MULTISTEP_MILESTONES, epoch_lr)


def torch_schedule(policy, base_lr, max_epochs, n=30, milestones=None,
                   gamma=0.5):
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    if policy == "linear":
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lambda e: 1.0 - e / float(max_epochs + 1))
    elif policy == "step":
        sched = torch.optim.lr_scheduler.StepLR(
            opt, step_size=max_epochs // 3, gamma=0.1)
    else:
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(milestones), gamma=gamma)
    lrs = []
    for _ in range(n):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return lrs


@pytest.mark.parametrize("policy", ["linear", "step"])
def test_lr_curves_match_torch(policy):
    base, maxe = 0.001, 20
    ref = torch_schedule(policy, base, maxe)
    ours = [epoch_lr(base, e, policy, maxe) for e in range(30)]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_multistep_matches_torch():
    base, maxe = 0.001, 200
    ref = torch_schedule("multistep", base, maxe, n=30,
                         milestones=LEVIR_MULTISTEP_MILESTONES, gamma=0.5)
    ours = [epoch_lr(base, e, "multistep", maxe) for e in range(30)]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)

    ref2 = torch_schedule("multistep", 1e-4, 100, n=40,
                          milestones=XBD_MULTISTEP_MILESTONES, gamma=0.6)
    ours2 = [epoch_lr(1e-4, e, "multistep", 100,
                      milestones=XBD_MULTISTEP_MILESTONES, gamma=0.6)
             for e in range(40)]
    np.testing.assert_allclose(ours2, ref2, rtol=1e-6)


def test_multistep_xbd_step_with_epoch_arg():
    """The xBD trainers call scheduler.step(current_epoch) at epoch END
    (xBD_code/train.py:386), which shifts every gamma drop one epoch past
    its milestone. Oracle replicates that exact call pattern."""
    base = 1e-4
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # torch deprecates the epoch arg
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(XBD_MULTISTEP_MILESTONES), gamma=0.6)
        ref = []
        for epoch in range(40):
            ref.append(opt.param_groups[0]["lr"])  # lr used during `epoch`
            sched.step(epoch)
    ours = [epoch_lr(base, e, "multistep", 100,
                     milestones=XBD_MULTISTEP_MILESTONES, gamma=0.6,
                     after_epoch_step=True)
            for e in range(40)]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
