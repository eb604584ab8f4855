from tpugan.optim.lreq_adam import lreq_adam, LreqAdamState

__all__ = ["lreq_adam", "LreqAdamState"]
