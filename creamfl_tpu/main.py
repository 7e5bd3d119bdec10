"""CLI entry (reference `src/main.py` — flag surface preserved verbatim,
plus TPU-build extensions: --synthetic/--smoke scaling knobs and mesh
controls).

Run (paper config; BASELINE.md):
  python -m creamfl_tpu.main --name CreamFL --server_lr 1e-5 \
      --agg_method con_w --contrast_local_inter --contrast_local_intra \
      --interintra_weight 0.5

Smoke run (no datasets / CPU):
  JAX_PLATFORMS=cpu python -m creamfl_tpu.main --synthetic --smoke \
      --comm_rounds 1 --local_epochs 1 --num_img_clients 1 \
      --num_txt_clients 1 --num_mm_clients 1 --client_num_per_round 2
"""

from __future__ import annotations

import argparse
import os
import random


def add_args(parser: argparse.ArgumentParser) -> None:
    # -- reference flag surface (src/main.py:38-106) -------------------
    parser.add_argument('--name', type=str, default='Test',
                        help='The name for different experimental runs.')
    parser.add_argument('--exp_dir', type=str, default='./experiments/',
                        help='Locations to save different experimental runs.')
    parser.add_argument('--local_epochs', type=int, default=5)
    parser.add_argument('--comm_rounds', type=int, default=30)
    parser.add_argument('--model', type=str, default='resnet34',
                        help='Target model name')
    parser.add_argument('--img_model_local', type=str, default='resnet10')
    parser.add_argument('--pretrained', type=int, default=0)
    parser.add_argument('--no-cuda', action='store_true', default=False,
                        help='(unused on TPU; kept for CLI parity)')
    parser.add_argument('--seed', type=int,
                        default=random.randint(0, 100000))
    parser.add_argument('--device', type=int, default=0)
    parser.add_argument('--num_img_clients', type=int, default=10)
    parser.add_argument('--num_txt_clients', type=int, default=10)
    parser.add_argument('--num_mm_clients', type=int, default=15)
    parser.add_argument('--client_num_per_round', type=int, default=10)
    parser.add_argument('--dataset', type=str, default='cifar100',
                        choices=['svhn', 'cifar10', 'cifar100'])
    parser.add_argument('--data_root', type=str,
                        default=os.environ.get('HOME', '.') + "/data/")
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--alpha', type=float, default=0.5)
    parser.add_argument('--server_lr', type=float, default=0.0002)
    parser.add_argument('--lr', type=float, default=0.1)
    parser.add_argument('--loss', type=str, default='l1',
                        choices=['l1', 'kl', 'l1softmax'])
    parser.add_argument('--scheduler', type=str, default='multistep',
                        choices=['multistep', 'cosine', 'exponential',
                                 'none'])
    parser.add_argument('--steps', nargs='+',
                        default=[0.05, 0.15, 0.3, 0.5, 0.75], type=float)
    parser.add_argument('--scale', type=float, default=0.1)
    parser.add_argument('--weight_decay', type=float, default=5e-4)
    parser.add_argument('--momentum', type=float, default=0.9)
    parser.add_argument('--log_interval', type=int, default=10)
    parser.add_argument('--save_interval', type=int, default=10)
    parser.add_argument('--disable_distill', action="store_true",
                        default=False)
    parser.add_argument('--agg_method', type=str, default='con_w')
    parser.add_argument('--contrast_local_intra', action="store_true",
                        default=False)
    parser.add_argument('--contrast_local_inter', action="store_true",
                        default=False)
    parser.add_argument('--mlp_local', action="store_true", default=False)
    parser.add_argument('--kd_weight', type=float, default=0.3)
    parser.add_argument('--interintra_weight', type=float, default=0.5)
    parser.add_argument('--loss_scale', action='store_true', default=False)
    parser.add_argument('--save_client', action='store_true',
                        default=False)
    parser.add_argument('--data_local', action='store_true', default=False)
    parser.add_argument('--pub_data_num', type=int, default=50000)
    parser.add_argument('--feature_dim', type=int, default=256)
    parser.add_argument('--not_bert', action='store_true', default=False)

    # -- TPU-build extensions ------------------------------------------
    parser.add_argument('--synthetic', action='store_true', default=False,
                        help='use synthetic datasets (no real data needed)')
    parser.add_argument('--smoke', action='store_true', default=False,
                        help='tiny shapes: small models/images/public set')
    parser.add_argument('--paper_scale', action='store_true',
                        default=False,
                        help='full paper geometry on synthetic data: '
                             '50k public set @224px, R101+BERT, 25k-'
                             'caption retrieval eval (pre-rendered '
                             'into RAM)')
    parser.add_argument('--coco_root', type=str, default=None)
    parser.add_argument('--cifar_root', type=str, default=None)
    parser.add_argument('--agnews_root', type=str, default=None)
    parser.add_argument('--f30k_root', type=str, default=None)
    parser.add_argument('--vocab_path', type=str, default=None)
    parser.add_argument('--bert_vocab', type=str, default=None)
    parser.add_argument('--wandb', action='store_true', default=False)
    parser.add_argument('--ckpt_dir', type=str, default=None,
                        help='round-checkpoint directory (enables resume)')
    parser.add_argument('--no_client_parallel', dest='client_parallel',
                        action='store_false', default=True,
                        help='disable stacked client-parallel execution')
    parser.add_argument('--no_mesh', dest='use_mesh',
                        action='store_false', default=True,
                        help='disable the multi-device mesh (single-'
                             'device execution even on a slice)')
    parser.add_argument('--mesh_devices', type=int, default=0,
                        help='cap the mesh to the first N devices '
                             '(0 = all)')
    parser.add_argument('--stack_bucket', type=str, default='even',
                        choices=['none', 'even', 'pow2'],
                        help='single-device family-stack padding policy:'
                             ' bucket sampled family sizes to stable '
                             'shapes so rounds reuse compiled programs '
                             '(pad slots are masked)')
    parser.add_argument('--coco_subset_idx', type=str, default=None,
                        help='frozen public-subset index file (default: '
                             'the packaged reference artifact)')
    parser.add_argument('--resnet_ckpt', type=str, default=None,
                        help='torchvision ResNet state_dict (.pth) for the '
                             'server image trunk')
    parser.add_argument('--bert_ckpt', type=str, default=None,
                        help='HF bert-base-uncased state_dict (.pth/.bin)')
    parser.add_argument('--glove_path', type=str, default=None,
                        help='GloVe text vectors for GRU text encoders')
    parser.add_argument('--client_resnet_ckpt', type=str, default=None,
                        help='torchvision resnet state_dict for image '
                             'client trunks')
    parser.add_argument('--data_backend', type=str, default='array',
                        choices=['array', 'grain'],
                        help='host input pipeline backend')
    parser.add_argument('--num_workers', type=int, default=0,
                        help='grain worker processes for the input '
                             'pipeline')
    parser.add_argument('--client_bf16', action='store_true',
                        default=False,
                        help='bf16 conv compute for image client trunks')
    parser.add_argument('--coco_client', type=int, default=-1,
                        help='per-client COCO shard index '
                             '(load_datasets.py client>-1 path)')
    parser.add_argument('--resume', action='store_true', default=False,
                        help='resume from the latest round checkpoint')
    parser.add_argument('--cosine_t_max', type=int, default=0,
                        help='override the cosine schedule T_max '
                             '(0 = yaml value, 30, like the reference)')


def build_configs(args):
    """Server/mm-client configs with the reference's runtime overrides
    (MMFL.py:81-88,157-163)."""
    from creamfl_tpu.config import default_config_path, parse_config
    from creamfl_tpu.models.bert import BertConfig

    server = parse_config(default_config_path("coco.yaml"),
                          strict_cast=False)
    server.model.embed_dim = args.feature_dim
    server.model.not_bert = bool(args.not_bert)
    server.model.cnn_type = ('resnet50' if args.not_bert else 'resnet101')
    server.optimizer.learning_rate = args.server_lr
    # Reference parity: the yaml T_max (30) is kept regardless of
    # --comm_rounds (the reference never rewires it — coco.yaml:38 is
    # used verbatim at MMFL.py:286 via the cosine scheduler built at
    # retrieval_trainer.py:72). --cosine_t_max overrides explicitly.
    if getattr(args, 'cosine_t_max', 0):
        server.lr_scheduler.T_max = args.cosine_t_max

    mm = parse_config(default_config_path("f30k.yaml"), strict_cast=False)
    mm.model.embed_dim = args.feature_dim
    mm.model.not_bert = True
    if getattr(args, 'cosine_t_max', 0):
        mm.lr_scheduler.T_max = args.cosine_t_max

    bert_config = BertConfig()
    if args.smoke:
        server.model.cnn_type = 'resnet10'
        mm.model.cnn_type = 'resnet10'
        server.model.word_dim = 32
        mm.model.word_dim = 32
        bert_config = BertConfig.tiny()
    return server, mm, bert_config


def build_datasets(args):
    from creamfl_tpu.data import pipelines
    from creamfl_tpu.data.tokenize import BertWordPieceTokenizer

    if not args.synthetic:
        try:
            home = os.environ.get('HOME', '.')
            return pipelines.build_real_datasets(
                args,
                vocab_path=args.vocab_path,  # None -> packaged frozen vocab
                coco_root=args.coco_root or f"{home}/data/mmdata/MSCOCO/2014",
                cifar_root=args.cifar_root or f"{home}/data/cifar100",
                agnews_root=args.agnews_root or f"{home}/data",
                f30k_root=args.f30k_root or f"{home}/data/f30k",
                bert_vocab=args.bert_vocab)
        except FileNotFoundError as e:
            print(f"real datasets unavailable ({e}); "
                  f"falling back to --synthetic")
    bert_tok = (None if args.not_bert
                else BertWordPieceTokenizer.synthetic())
    if args.smoke:
        scale = dict(pub_size=128, image_size=64, max_len=12,
                     client_data_size=64, test_size=32,
                     retrieval_test_size=60)
    elif getattr(args, "paper_scale", False):
        # Full paper geometry (MMFL.py round schedule / BASELINE.md):
        # 50k public captions at 224px, CIFAR-resolution image clients,
        # COCO-5K-test-sized retrieval eval. Caption sets are
        # pre-rendered into RAM and loaders prefetch on a thread so the
        # single host core can feed the chip.
        # device_images: 224px tensors are synthesized on-accelerator
        # (data/device_synth.py) — this VM faults fresh host RAM at
        # ~10 MB/s, so neither a 30 GB host cache nor per-epoch host
        # generation can feed the chip. Caption fields are cached.
        scale = dict(pub_size=args.pub_data_num, image_size=224,
                     max_len=32, client_data_size=5000,
                     mm_client_data_size=2000, test_size=1024,
                     retrieval_test_size=25000, cache=True,
                     client_image_size=32, prefetch=2,
                     device_images=True, pub_batch_size=128,
                     pub_eval_batch_size=256)
    else:
        scale = dict(pub_size=min(args.pub_data_num, 2048),
                     image_size=224, max_len=32, client_data_size=512,
                     test_size=256, retrieval_test_size=500,
                     pub_batch_size=128, pub_eval_batch_size=256)
    return pipelines.build_synthetic_datasets(args,
                                              bert_tokenizer=bert_tok,
                                              **scale)


def _enable_compile_cache():
    import jax

    try:
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT cache artifacts encode the compile host's ISA
            # extensions and SEGFAULT on (de)serialize after a VM
            # live-migration to a host missing them (tests/conftest.py
            # caps codegen at AVX2 for the test cache instead); skip
            # persistence for ad-hoc CPU runs.
            return
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass


def run(args) -> None:
    _enable_compile_cache()
    from creamfl_tpu.federation.rounds import MMFL
    from creamfl_tpu.utils.helper import set_seed
    from creamfl_tpu.utils.logging import PythonLogger, get_tracker

    # Seed the GLOBAL python/numpy RNGs like the reference
    # (main.py:122 -> helper.set_seed): partition regeneration
    # (flickr30k non-IID draw) and any np.random consumers are
    # deterministic per --seed.
    set_seed(args.seed)
    os.makedirs(args.exp_dir, exist_ok=True)
    logger = PythonLogger(output_file=os.path.join(args.exp_dir,
                                                   f"{args.name}.log"))
    tracker = get_tracker(args.name, enabled=args.wandb)
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    datasets = build_datasets(args)

    algo = MMFL(args, datasets, server_cfg, mm_cfg, tracker=tracker,
                logger=logger, bert_config=bert_cfg)
    start_round = algo.resume() if args.resume else 0
    for round_n in range(start_round, args.comm_rounds):
        algo.train(round_n)
    logger.log("Best:")
    if algo.best_scores is not None:
        logger.log_dict({
            "best_epoch": algo.best_metadata["best_epoch"],
            "best_rsum_r1": algo.best_metadata["best_score"],
        })


def cli() -> None:
    parser = argparse.ArgumentParser(description='Federated Learning')
    add_args(parser)
    run(parser.parse_args())


if __name__ == "__main__":
    cli()
