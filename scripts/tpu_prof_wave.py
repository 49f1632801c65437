"""Profile ONE e2e render wave on the 2.4M-tri cluster scene.

Captures a jax.profiler device trace of a single renderer step and
aggregates kernel wall time by name, so the 4x gap between standalone
primary sweeps (4.8M rays/s) and the e2e wave (1.18M) gets a breakdown:
cluster sweeps vs cull vs any-hit vs sort/compaction vs integrator
epilogue ops.

Run under `timeout`; kill the exact PID if it hangs (CLAUDE.md).
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np
import jax

sys.path.insert(0, '/root/repo')

import pathtracer_tpu as pt
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.utils import procgen

W, H = 1920, 1080
LOGDIR = '/tmp/prof_wave'


def log(*a):
    print(*a, flush=True)


md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
log('tris:', md.num_triangles)
objs = scn.default_objects()
objs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
sc = scn.build_scene(objs, scn.default_light_intensity())
log('use_cluster:', sc.meshes[0].use_cluster, 'n_clusters:',
    sc.meshes[0].n_clusters)

cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
cfg = rnd.RenderConfig(width=W, height=H, nrays=64, nb_bounces=3,
                       samples_per_wave=1, compact_rays=True)
r = rnd.Renderer(sc, cam, cfg)
log('warmup (compile)...')
t0 = time.perf_counter()
r.step(1)
jax.block_until_ready(r.image)
log(f'warmup {time.perf_counter() - t0:.1f}s')

t0 = time.perf_counter()
r.step(1)
jax.block_until_ready(r.image)
wave_s = time.perf_counter() - t0
log(f'steady wave: {wave_s:.2f}s')

log('tracing one wave...')
with jax.profiler.trace(LOGDIR):
    r.step(1)
    jax.block_until_ready(r.image)
log('trace done')

files = sorted(glob.glob(LOGDIR + '/**/*.trace.json.gz', recursive=True))
log('trace files:', files)
if not files:
    sys.exit('no trace produced')

with gzip.open(files[-1], 'rt') as f:
    tr = json.load(f)

events = tr['traceEvents']
# find device-track pids (TPU / device compute lanes)
pid_name = {}
for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
        pid_name[e['pid']] = e['args'].get('name', '')
log('processes:', pid_name)

dev_pids = {p for p, nm in pid_name.items()
            if 'TPU' in nm or 'device' in nm.lower() or 'Axon' in nm
            or 'XLA' in nm}
# dump one event with args to learn the metadata schema
for e in events:
    if e.get('ph') == 'X' and e.get('pid') in dev_pids and e.get('args'):
        log('sample event:', json.dumps(e)[:600])
        break

agg = defaultdict(float)
cnt = defaultdict(int)
scope_agg = defaultdict(float)
total = 0.0
for e in events:
    if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
        continue
    nm = e['name']
    dur = e.get('dur', 0) / 1e6  # us -> s
    agg[nm] += dur
    cnt[nm] += 1
    total += dur
    args = e.get('args') or {}
    # jax.named_scope lands in the op_name / long_name metadata
    meta = args.get('long_name') or args.get('tf_op') or args.get('name') \
        or ''
    scope = 'other'
    for s in ('closest_hit', 'shadow_nee', 'octant_sort', 'unsort',
              'splat', 'fog', 'subsurface'):
        if s in str(meta) or s in str(args):
            scope = s
            break
    scope_agg[scope] += dur

log(f'\ndevice total (sum of events, may double-count lanes): {total:.3f}s')
log('\nby named scope:')
for nm, s in sorted(scope_agg.items(), key=lambda kv: -kv[1]):
    log(f'  {nm:<16} {s:>8.3f}s')
log(f'\n{"kernel":<90} {"count":>6} {"sum_s":>8}')
for nm, s in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
    log(f'{nm[:90]:<90} {cnt[nm]:>6} {s:>8.3f}')
