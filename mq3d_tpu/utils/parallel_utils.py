"""Host-side fan-out helper, API-compatible with the reference's
parallel_map (reference: scripts/utils/paralell_utils.py:6-69).

In the TPU-native framework the heavy fan-outs are batch dimensions on
device, so host parallelism is rarely needed; this helper remains for IO
scripts and keeps the per-item exception-swallowing semantics
(`default_on_error`).  Multiprocessing maps to a thread pool: workloads
here are IO-bound, and one process owns the TPU.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, List, Optional

from tqdm import tqdm


class ParallelWorker:
    def __init__(self, func: Callable, default=None):
        self.func = func
        self.default = default

    def __call__(self, args):
        try:
            if isinstance(args, tuple):
                return self.func(*args)
            return self.func(args)
        except Exception as e:
            print(f"[Error] {self.func.__name__} failed: {e}")
            return self.default


def parallel_map(
    func: Callable,
    args_list: List[Any],
    max_workers: Optional[int] = None,
    use_multiprocessing: bool = False,
    context: str = "spawn",  # accepted for API compat; threads are used
    default_on_error=None,
    show_progress: bool = False,
    desc: Optional[str] = None,
) -> List[Any]:
    del context
    worker = ParallelWorker(func, default_on_error)

    if not use_multiprocessing or len(args_list) <= 1:
        it: Iterable = args_list
        if show_progress:
            it = tqdm(args_list, total=len(args_list), desc=desc)
        return [worker(a) for a in it]

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = ex.map(worker, args_list)
        if show_progress:
            futures = tqdm(futures, total=len(args_list), desc=desc)
        return list(futures)
