"""CLI + JSON config system.

Accepts the exact reference configs (/root/reference/configs/*.json) and CLI
surface of /root/reference/train.py:501-567; FLAGS is a plain dict (jit- and
pickle-friendly).  One extension: `data_root` resolves the configs' relative
asset paths ('data/...') against a dataset root directory (the reference runs
from its own repo root; we default to the mounted reference data)."""

import argparse
import json
import os
import sys

DEFAULTS = dict(
    iter=5000,
    batch=1,
    spp=1,
    layers=1,
    train_res=[512, 512],
    display_res=None,
    texture_res=[1024, 1024],
    display_interval=0,
    save_interval=1000,
    learning_rate=0.01,
    custom_mip=False,
    background='checker',
    loss='logl1',
    out_dir=None,
    config=None,
    ref_mesh=None,
    base_mesh=None,
    validate=True,
    n_samples=4,
    bsdf='pbr',
    denoiser='bilateral',
    denoiser_demodulate=True,
    # extended defaults (reference train.py:529-562)
    mtl_override=None,
    dmtet_grid=64,
    mesh_scale=2.1,
    envlight=None,
    env_scale=1.0,
    probe_res=256,
    learn_lighting=True,
    display=None,
    transparency=False,
    lock_light=False,
    lock_pos=False,
    sdf_regularizer=0.2,
    laplace='relative',
    laplace_scale=3000.0,
    pre_load=True,
    no_perturbed_nrm=False,
    decorrelated=False,
    kd_min=[0.0, 0.0, 0.0, 0.0],
    kd_max=[1.0, 1.0, 1.0, 1.0],
    ks_min=[0.0, 0.08, 0.0],
    ks_max=[0.0, 1.0, 1.0],
    nrm_min=[-1.0, -1.0, 0.0],
    nrm_max=[1.0, 1.0, 1.0],
    clip_max_norm=0.0,
    cam_near_far=[0.1, 1000.0],
    lambda_kd=0.1,
    lambda_ks=0.05,
    lambda_nrm=0.025,
    lambda_nrm2=0.25,
    lambda_chroma=0.0,
    lambda_diffuse=0.15,
    lambda_specular=0.0025,
    # TPU-framework extensions
    data_root='/root/reference',
    resume=True,
    checkpoint_interval=0,
    # The reference tuned its absolute-iteration schedules (shadow ramp
    # it/1750, train.py:340-343 + dmtet.py:220-223; lr decay 10^(-0.0002*it),
    # train.py:340) jointly for a 5000-iter budget.  With scale_schedules on
    # (default) both are rescaled proportionally to FLAGS['iter'] so reduced
    # budgets train and validate under the same effective schedule; at
    # iter == 5000 the values are exactly the reference's.
    scale_schedules=True,
    # split each optimizer step into batch/micro_batch gradient programs,
    # accumulated on device: keeps every XLA program under the TPU worker
    # watchdog (~20 s, PERF_NOTES.md) at nerf-scale batch x 800^2 workloads.
    # 0 = off (single program, reference semantics).
    micro_batch=0,
    leaf_size=128,
    max_tris=None,
    # DMTet SDF initialization: 'random' (reference parity,
    # /root/reference/geometry/dmtet.py:195) or 'sphere' (warm start from an
    # enclosing sphere; skips the carve-the-blob transient — see
    # geometry/dmtet.py).
    sdf_init='random',
    # Pass-boundary floater pruning: connected components smaller than this
    # fraction of total faces are dropped from the baked base mesh
    # (measured spot@128^2: cow = 4105 faces, all 48 floaters <= 48 faces;
    # 1% cleanly separates them)
    # (train.py:prune_small_components).  0 = off (reference parity).
    prune_components=0.01,
    out_root='out',
)


def strtobool(s):
    """Strict bool converter for CLI flags: accepts the usual spellings,
    rejects anything else (so `--resume 0` disables resume instead of
    silently enabling it)."""
    v = str(s).strip().lower()
    if v in ('1', 'true', 't', 'yes', 'y', 'on'):
        return True
    if v in ('0', 'false', 'f', 'no', 'n', 'off'):
        return False
    raise argparse.ArgumentTypeError('expected a boolean, got %r' % s)


def parse_flags(argv=None):
    # allow_abbrev=False: explicit-CLI detection below matches raw argv
    # tokens against full option strings; prefix abbreviations would parse
    # but dodge the match and let the config silently override them.
    parser = argparse.ArgumentParser(description='nvdiffrecmc_tpu',
                                     allow_abbrev=False)
    parser.add_argument('-i', '--iter', type=int, default=5000)
    parser.add_argument('-b', '--batch', type=int, default=1)
    parser.add_argument('-s', '--spp', type=int, default=1)
    parser.add_argument('-l', '--layers', type=int, default=1)
    parser.add_argument('-r', '--train-res', nargs=2, type=int,
                        default=[512, 512])
    parser.add_argument('-dr', '--display-res', type=int, default=None)
    parser.add_argument('-tr', '--texture-res', nargs=2, type=int,
                        default=[1024, 1024])
    parser.add_argument('-di', '--display-interval', type=int, default=0)
    parser.add_argument('-si', '--save-interval', type=int, default=1000)
    parser.add_argument('-lr', '--learning-rate', type=float, default=0.01)
    parser.add_argument('-mip', '--custom-mip', action='store_true',
                        default=False)
    parser.add_argument('-bg', '--background', default='checker',
                        choices=['black', 'white', 'checker', 'reference'])
    parser.add_argument('--loss', default='logl1',
                        choices=['logl1', 'logl2', 'mse', 'smape',
                                 'relativel2', 'n2n'])
    parser.add_argument('-o', '--out-dir', type=str, default=None)
    parser.add_argument('--config', type=str, default=None)
    parser.add_argument('-rm', '--ref_mesh', type=str)
    parser.add_argument('-bm', '--base-mesh', type=str, default=None)
    parser.add_argument('--validate', type=strtobool, default=True)
    parser.add_argument('--n_samples', type=int, default=4)
    parser.add_argument('--bsdf', type=str, default='pbr',
                        choices=['pbr', 'diffuse', 'white'])
    parser.add_argument('--denoiser', default='bilateral',
                        choices=['none', 'bilateral'])
    parser.add_argument('--denoiser_demodulate', type=bool, default=True)
    parser.add_argument('--data-root', type=str,
                        default=DEFAULTS['data_root'])
    parser.add_argument('--micro-batch', type=int,
                        default=DEFAULTS['micro_batch'])
    parser.add_argument('--checkpoint-interval', type=int,
                        default=DEFAULTS['checkpoint_interval'])
    parser.add_argument('--resume', type=strtobool,
                        default=DEFAULTS['resume'],
                        help='resume from <out_dir>/checkpoint_*.pkl when '
                             'present (default on).  Note: the checkpoint '
                             'stores params/opt_state/iteration only — a '
                             'resumed run re-seeds the batch shuffle and '
                             'noise streams, so it is statistically, not '
                             'bitwise, continuous with the original.')
    parser.add_argument('--scale-schedules', type=strtobool,
                        default=DEFAULTS['scale_schedules'])
    parser.add_argument('--sdf-init', choices=['random', 'sphere'],
                        default=DEFAULTS['sdf_init'])
    parser.add_argument('--prune-components', type=float,
                        default=DEFAULTS['prune_components'],
                        help='drop mesh components smaller than this '
                             'fraction of total faces at the pass-1 -> '
                             'pass-2 bake boundary (0 disables)')
    args = parser.parse_args(argv)

    FLAGS = dict(DEFAULTS)
    for k, v in vars(args).items():
        FLAGS[k] = v

    if FLAGS['config'] is not None:
        data = json.load(open(FLAGS['config'], 'r'))
        for key in data:
            FLAGS[key] = data[key]
        # explicitly-passed CLI flags win over the config file (so
        # `--config spot.json -i 20` runs 20 iters); argparse defaults do
        # not.  The reference lets the config clobber the CLI — that makes
        # short smoke runs impossible without editing configs.  Detect
        # explicitness by PRESENCE in argv, not value != default: passing
        # a flag at its default value (e.g. `--validate true` over a
        # config that says false) must still win.
        opt_to_dest = {}
        for action in parser._actions:
            for opt in action.option_strings:
                opt_to_dest[opt] = action.dest
        argv_eff = sys.argv[1:] if argv is None else argv
        explicit = set()
        for tok in argv_eff:
            opt = tok.split('=', 1)[0]
            if opt in opt_to_dest:
                explicit.add(opt_to_dest[opt])
        for k in explicit:
            FLAGS[k] = getattr(args, k)

    apply_schedule_scaling(FLAGS)

    if FLAGS['display_res'] is None:
        FLAGS['display_res'] = FLAGS['train_res']
    if FLAGS['out_dir'] is None:
        FLAGS['out_dir'] = os.path.join(
            FLAGS['out_root'], 'cube_%d' % FLAGS['train_res'][0])
    else:
        FLAGS['out_dir'] = os.path.join(FLAGS['out_root'], FLAGS['out_dir'])
    return FLAGS


REFERENCE_BUDGET = 5000        # the iter count the reference's schedules
REFERENCE_SHADOW_RAMP = 1750.0  # assume (train.py:340-343, dmtet.py:220)
REFERENCE_LR_DECAY = 0.0002     # 10^(-rate*it): 1.0 -> 0.1 over 5000 iters


def apply_schedule_scaling(FLAGS):
    """Derive the effective schedule constants for this budget.

    shadow_ramp_iters: shadow/denoiser influence ramps 0->1 over this many
    iterations; lr_decay_rate: lr = 10^(-rate * it) after warmup.  With
    scale_schedules (default) both scale with FLAGS['iter'] / 5000 so a
    300-iter run ramps shadows over 105 iters and ends at lr*0.1, exactly
    like the reference's 5000-iter run does in proportion.  At iter == 5000,
    or with scale_schedules false, the reference constants are used
    verbatim."""
    if FLAGS.get('scale_schedules', True):
        s = max(FLAGS['iter'], 1) / float(REFERENCE_BUDGET)
    else:
        s = 1.0
    FLAGS['shadow_ramp_iters'] = REFERENCE_SHADOW_RAMP * s
    FLAGS['lr_decay_rate'] = REFERENCE_LR_DECAY / s
    return FLAGS


def resolve_path(FLAGS, p):
    """Resolve a config-relative asset path against data_root."""
    if p is None or os.path.isabs(p) or os.path.exists(p):
        return p
    cand = os.path.join(FLAGS['data_root'], p)
    return cand if os.path.exists(cand) else p
