'''
Dataset/loader factory: source sniffing + train/val/test construction.

Reimplements /root/reference/data/data.py:27-228: kubric vs plugin source detection by path
substring/extension, the train->test dset_args propagation with an explicit override
whitelist (use_data_frac, augs_2d=False, num_queries) to block train/test domain shift, and
plugin test args (prefetch=True, center_crop).

The loader is a bounded-prefetch batcher with selectable worker mode: 'thread' (default;
right for few-core hosts and CI) or 'process' (fork-based worker pool like the reference's
torch DataLoader workers, data.py:74-84 — use on many-core production hosts where the
cv2/numpy item pipeline would serialize on the GIL). Items are deterministic functions of
(seed, epoch, index, retries) (kubric.py:_item_rng), so both modes produce identical
batches.
'''

import queue
import threading
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from tcow_tpu.data import kubric as kubric_lib
from tcow_tpu.data import plugin as plugin_lib


def is_kubric_source(p: str) -> bool:
    pl = p.lower()
    return 'kubcon' in pl or 'kubbench' in pl or 'kubric' in pl


def is_plugin_source(p: str) -> bool:
    pl = p.lower()
    return ('plugin' in pl or 'rubric' in pl
            or pl.endswith(('.mp4', '.avi', '.gif', '.webm')))


# Fork-inherited dataset for process workers, bound per-worker via the pool initializer:
# under the fork start method initargs are inherited by reference (never pickled), so
# worker tasks only pickle (function, index) and results; the dataset object itself never
# crosses a pipe. Each executor binds its own dataset even if several loaders iterate
# concurrently (workers are forked lazily at first submit in py3.12+).
_WORKER_DATASET = None


def _bind_worker_dataset(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_getitem(idx: int):
    return _WORKER_DATASET[idx]


class PrefetchLoader:
    '''Iterates a dataset in batches with background workers + bounded prefetch.

    worker_mode 'thread' shares the parent's GIL (fine when item decode is cv2/numpy-bound
    on few cores); 'process' forks a worker pool per epoch (Linux only) so item loading
    scales with cores. Collation always happens in the parent (its RNG is a sequential
    stream), so batches are identical across modes.

    fork caveat: in a trainer the fork happens after the JAX backend is initialized and
    multithreaded, which carries the standard fork-after-threads hazard (a child can
    inherit a mutex held mid-operation). Workers never touch JAX and exit via os._exit
    (multiprocessing children skip atexit), the same risk profile as torch DataLoader
    fork workers; if a deployment hits it, fall back to worker_mode=thread.

    shard_rank/shard_count (multi-host): each process loads ONLY its batch_size /
    shard_count rows of every global batch (rows [rank*B_local, (rank+1)*B_local) in the
    shared same-seed global order) — mesh.shard_batch assembles the global array from the
    local rows, so host decode work scales down with the number of hosts.'''

    def __init__(self, dataset, batch_size: int, collate_fn: Callable, shuffle: bool,
                 drop_last: bool, num_workers: int = 2, prefetch_depth: int = 2,
                 seed: int = 0, worker_mode: str = 'thread',
                 shard_rank: int = 0, shard_count: int = 1):
        assert worker_mode in ('thread', 'process'), worker_mode
        assert 0 <= shard_rank < shard_count, (shard_rank, shard_count)
        assert batch_size % shard_count == 0, (batch_size, shard_count)
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = prefetch_depth
        self.seed = seed
        self.worker_mode = worker_mode
        self.shard_rank = shard_rank
        self.shard_count = shard_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, 'set_epoch'):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        return self.iter_batches(0)

    def start_ahead(self, epoch: int, prefetch_depth: Optional[int] = None):
        '''Begin producing epoch `epoch`'s batches into the bounded prefetch queue NOW —
        e.g. kick off a validation loader's item pipeline while the train epoch is still
        running on the device (round-2 accounting showed val epochs ~59% loader-wait
        because their cold pipelines only started when the train epoch finished). The
        next iter_batches(0) at this epoch consumes the pre-started producer; any other
        iteration tears it down. `prefetch_depth` overrides the queue bound for the
        pre-started producer (a whole small val epoch can be staged during a train
        epoch); item memory stays bounded by depth x batch bytes.'''
        self.set_epoch(epoch)
        self._teardown_ahead()
        self._ahead = (epoch, self._spawn(0, prefetch_depth=prefetch_depth))

    def _teardown_ahead(self):
        ahead = getattr(self, '_ahead', None)
        if ahead is not None:
            ahead[1][1].set()  # stop event: producer drains and exits
            self._ahead = None

    def iter_batches(self, start_step: int = 0):
        '''Iterate this epoch's batches from `start_step` onward. The batch ORDER is a
        pure function of (seed, epoch), so a mid-epoch resume (preemption checkpoint)
        skips the first `start_step` batches without loading a single item and visits
        exactly the examples the interrupted run had left.'''
        ahead = getattr(self, '_ahead', None)
        if ahead is not None and ahead[0] == self.epoch and start_step == 0:
            self._ahead = None
            handle = ahead[1]
        else:
            self._teardown_ahead()
            handle = self._spawn(start_step)
        q, stop = handle
        try:
            while True:
                kind, payload = q.get()
                if kind == 'done':
                    return
                if kind == 'err':
                    raise payload
                yield payload
        finally:
            stop.set()

    def _spawn(self, start_step: int, prefetch_depth: Optional[int] = None):
        '''Starts the producer thread for this epoch; returns (queue, stop_event).'''
        rng = np.random.default_rng(self.seed * 77 + self.epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        n_batches = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(start_step, n_batches)]
        if self.shard_count > 1:
            b_local = self.batch_size // self.shard_count
            lo = self.shard_rank * b_local
            batches = [b[lo:lo + b_local] for b in batches]

        q: 'queue.Queue' = queue.Queue(maxsize=prefetch_depth or self.prefetch_depth)
        stop = threading.Event()

        def make_pool():
            import concurrent.futures
            if self.worker_mode == 'process':
                import multiprocessing as mp
                if 'fork' not in mp.get_all_start_methods():
                    if getattr(self.dataset, 'logger', None) is not None:
                        self.dataset.logger.warning(
                            'worker_mode=process needs fork (Linux); using threads.')
                    return (concurrent.futures.ThreadPoolExecutor(self.num_workers),
                            self.dataset.__getitem__)
                pool = concurrent.futures.ProcessPoolExecutor(
                    self.num_workers, mp_context=mp.get_context('fork'),
                    initializer=_bind_worker_dataset, initargs=(self.dataset,))
                return pool, _process_worker_getitem
            return (concurrent.futures.ThreadPoolExecutor(self.num_workers),
                    self.dataset.__getitem__)

        def safe_put(payload) -> bool:
            # Never block forever on a full queue: an abandoned iteration (consumer broke
            # out early) would otherwise leave the producer — and in process mode its
            # forked worker pool — alive indefinitely.
            while not stop.is_set():
                try:
                    q.put(payload, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            pool, getitem = make_pool()
            with pool:
                for batch_inds in batches:
                    if stop.is_set():
                        return
                    try:
                        items = list(pool.map(getitem, batch_inds))
                        if not safe_put(('ok', self.collate_fn(items))):
                            return
                    except Exception as e:
                        safe_put(('err', e))
                        return
            safe_put(('done', None))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        return q, stop


def _device_color_jitter_auto(args) -> bool:
    '''--device_augs: -1 = auto (on for TPU backends, off elsewhere), 0/1 = forced.'''
    v = int(getattr(args, 'device_augs', -1))
    if v >= 0:
        return bool(v)
    try:
        import jax
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def _kubric_dset_args(args) -> Dict[str, Any]:
    return dict(
        device_color_jitter=_device_color_jitter_auto(args),
        num_frames=args.num_frames, frame_height=args.frame_height,
        frame_width=args.frame_width, frame_rate=args.kubric_frame_rate,
        frame_stride=args.kubric_frame_stride, max_delay=args.kubric_max_delay,
        use_data_frac=args.use_data_frac, augs_2d=args.augs_2d,
        num_queries=args.num_queries, query_time=args.seeker_query_time,
        max_objects=int(getattr(args, 'max_objects', 36)),
        front_occl_thres=args.front_occl_thres,
        outer_cont_thres=args.outer_cont_thres, reverse_prob=args.kubric_reverse_prob,
        palindrome_prob=args.kubric_palindrome_prob,
        time_stretch_max=(float(getattr(args, 'rope_time_stretch', 1.0))
                          if int(getattr(args, 'rope_time_coords', 0)) else 1.0))


def create_train_val_data_loaders(args, logger, shard=(0, 1)):
    '''return (train_loader, val_aug_loader, val_noaug_loader, dset_args_sources).
    shard=(process_index, process_count) makes each multi-host process load only its
    rows of every global batch.'''
    dset_args_sources = {}
    loaders = {}
    for cur_data_path in args.data_path:
        if is_plugin_source(cur_data_path):
            raise NotImplementedError('Plugin video is only available at test time.')
        # Like the reference, any non-plugin directory is treated as kubric-format.
        dset_args = _kubric_dset_args(args)
        dset_args_sources['kubric'] = dset_args
        for phase, enabled in (('train', True), ('val_aug', args.do_val_aug),
                               ('val_noaug', args.do_val_noaug)):
            if not enabled:
                loaders.setdefault(phase, None)
                continue
            ds = kubric_lib.KubricQueryDataset(cur_data_path, logger, phase,
                                               seed=args.seed, **dset_args)
            collate = _make_kubric_collate(args.num_queries, phase, args.seed)
            mode = getattr(args, 'worker_mode', 'thread')
            # Threads stop paying off past the GIL; forked workers scale with cores.
            cap = 8 if mode == 'thread' else 32
            loaders[phase] = PrefetchLoader(ds, args.batch_size, collate, shuffle=True,
                                            drop_last=True,
                                            num_workers=min(args.num_workers, cap),
                                            seed=args.seed, worker_mode=mode,
                                            shard_rank=shard[0], shard_count=shard[1])
    return loaders['train'], loaders['val_aug'], loaders['val_noaug'], dset_args_sources


def _make_kubric_collate(num_queries: int, phase: str, seed: int):
    # zlib.crc32, not hash(): Python string hashes are randomized per process, which would
    # make query selection irreproducible across runs (and across multi-host processes).
    import zlib
    rng = np.random.default_rng(seed * 31 + zlib.crc32(phase.encode()) % 1000)

    def collate(items: List[Dict]) -> Dict[str, Any]:
        batch = kubric_lib.collate_kubric(items, num_queries, phase, rng=rng)
        batch_meta = {
            'source_name': 'kubric',
            'scene_dn': [it['scene_dn'] for it in items],
            'scene_idx': np.array([it['scene_idx'] for it in items]),
            'dset_idx': np.array([it['dset_idx'] for it in items]),
            'inst_count': np.array([it['inst_count'] for it in items]),
            'desirability': np.stack([it['desirability'] for it in items]),
        }
        return {'device': batch, 'meta': batch_meta}

    return collate


def _plugin_collate(items: List[Dict]) -> Dict[str, Any]:
    device = {
        'rgb': np.stack([it['rgb'] for it in items]),
        'query': np.stack([it['query'] for it in items]),
        'target': np.stack([it['target'] for it in items]),
    }
    meta = {k: [it[k] for it in items]
            for k in ('source_name', 'src_path', 'dset_idx', 'scene_idx', 'usage_mode_idx',
                      'frame_start', 'frame_stride', 'target_coverage',
                      'match_prefer_fstride')}
    meta['source_name'] = 'plugin'
    return {'device': device, 'meta': meta}


def create_test_data_loader(train_args: Dict[str, Any], test_args,
                            train_dset_args_sources: Dict[str, Any], logger,
                            data_path: Optional[str] = None):
    '''Builds ONE test loader for one data path (the reference's outer loop creates one at a
    time to bound memory, eval/test.py:83-108).
    return (loader, test_dset_args_sources).'''
    cur_data_path = data_path if data_path is not None else test_args.data_path[0]
    if 'kubric' not in train_dset_args_sources:
        train_dset_args_sources = {'kubric': train_dset_args_sources}
    test_dset_args_sources = {}

    if is_kubric_source(cur_data_path) or not is_plugin_source(cur_data_path):
        test_dset_args = dict(train_dset_args_sources['kubric'])
        test_dset_args.pop('load_full_segm', None)
        test_dset_args['use_data_frac'] = test_args.use_data_frac
        test_dset_args['augs_2d'] = False
        test_dset_args['num_queries'] = test_args.num_queries
        ds = kubric_lib.KubricQueryDataset(cur_data_path, logger, 'test',
                                           seed=test_args.seed, **test_dset_args)
        collate = _make_kubric_collate(test_args.num_queries, 'test', test_args.seed)
        test_dset_args_sources['kubric'] = test_dset_args
    else:
        ka = train_dset_args_sources['kubric']
        test_dset_args = dict(
            num_clip_frames=ka['num_frames'], frame_height=ka['frame_height'],
            frame_width=ka['frame_width'], frame_rate=test_args.plugin_frame_rate,
            prefer_frame_stride=test_args.plugin_prefer_frame_stride,
            query_time=ka['query_time'], annots_must_exist=test_args.annots_must_exist,
            prefetch=True, center_crop=test_args.center_crop)
        ds = plugin_lib.PluginVideoDataset(cur_data_path, logger, 'test', **test_dset_args)
        collate = _plugin_collate
        test_dset_args_sources['plugin'] = test_dset_args

    loader = PrefetchLoader(ds, test_args.batch_size, collate, shuffle=False,
                            drop_last=False, num_workers=min(test_args.num_workers, 4),
                            seed=test_args.seed,
                            worker_mode=getattr(test_args, 'worker_mode', 'thread'))
    return loader, test_dset_args_sources
