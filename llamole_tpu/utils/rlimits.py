"""Process resource-limit helpers."""

import os


def raise_stack_soft_limit(target_bytes: int = 512 * 1024 * 1024) -> None:
    """RAISE (never lower) the stack soft limit toward `target_bytes`.

    XLA:CPU compilation of the deepest programs (double while_loop
    decode, composite train steps) has segfaulted at the 8 MB default —
    consistent with a recursive compiler pass exhausting the stack. The
    main thread's stack grows on demand up to the soft limit, so raising
    it at startup is sufficient. No-ops (a) when the soft limit is
    already unlimited or >= target, (b) when the hard limit caps below
    target (raise to the hard limit instead), (c) on any OS refusal.
    """
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        if soft == resource.RLIM_INFINITY:
            return
        target = target_bytes
        if hard != resource.RLIM_INFINITY:
            target = min(target, hard)
        if soft >= target:
            return
        resource.setrlimit(resource.RLIMIT_STACK, (target, hard))
    except (ImportError, ValueError, OSError):
        pass
