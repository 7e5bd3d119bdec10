"""Import-time stubs that let the REFERENCE's own orchestration code
(`/root/reference/src/...`) run on this machine (torch-CPU, no network,
no torchvision/torchtext/pycocotools/munch/adamp/apex wheels).

Only *external pip packages* are stubbed — every line of reference
orchestration, engine, model, and criterion code executes verbatim.
The stubs fall into three classes:

* **Functional equivalents** the reference's math actually runs through:
  `munch.Munch` (attr-dict config), `adamp.AdamP` (Heo et al. 2021,
  reimplemented faithfully from the paper/official algorithm — the repo's
  JAX AdamP is independently tested against the same algorithm in
  tests/test_optim.py), a torchvision-layout ResNet family (standard
  He-init BasicBlock/Bottleneck resnets with torchvision attribute and
  state_dict naming, so `EncoderImage` consumes them exactly like
  torchvision's and the repo's `torchvision_resnet_to_flax` converter
  ports their weights; `pretrained=True` is accepted and ignored — the
  oracle grafts identical random weights into both frameworks, so
  pretrained-ness cancels).
* **No-op shims** for code paths the oracle configures off:
  `apex.amp.initialize` returns (model, optimizer) unchanged (the fp32
  path; `MMClientTrainer.run` calls it unconditionally,
  MMClientTrainer.py:96-97).
* **Import-only placeholders** referenced at module import but never
  called in the oracle: torchtext (GloVe path disabled via
  wemb_type=None), pycocotools (no COCO on disk), torchvision
  transforms/datasets (loaders are injected directly).
"""

from __future__ import annotations

import contextlib
import importlib.machinery
import math
import sys
import types

import torch
import torch.nn as nn


# ---------------------------------------------------------------------
# munch
# ---------------------------------------------------------------------
class Munch(dict):
    """Attribute-access dict (the subset of pip `munch` the reference
    uses: attr get/set, .get, nesting, unmunchify)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def fromDict(cls, d):
        return munchify(d)


def munchify(d):
    if isinstance(d, dict):
        return Munch({k: munchify(v) for k, v in d.items()})
    return d


def unmunchify(d):
    if isinstance(d, dict):
        return {k: unmunchify(v) for k, v in d.items()}
    return d


# ---------------------------------------------------------------------
# adamp.AdamP — the reference's server/mm-client optimizer
# (src/algorithms/optimizers.py:25-29 imports it from the pip package).
# Algorithm: Adam with bias correction applied to the lr, plus projection
# of the update onto the weight-orthogonal complement for scale-invariant
# parameters (cosine test against delta/sqrt(dim)).
# ---------------------------------------------------------------------
class AdamP(torch.optim.Optimizer):
    def __init__(self, params, lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                 weight_decay=0.0, delta=0.1, wd_ratio=0.1,
                 nesterov=False):
        defaults = dict(lr=lr, betas=betas, eps=eps,
                        weight_decay=weight_decay, delta=delta,
                        wd_ratio=wd_ratio, nesterov=nesterov)
        super().__init__(params, defaults)

    @staticmethod
    def _channel_view(x):
        return x.view(x.size(0), -1)

    @staticmethod
    def _layer_view(x):
        return x.view(1, -1)

    @staticmethod
    def _cosine_similarity(x, y, eps, view_func):
        x = view_func(x)
        y = view_func(y)
        return torch.nn.functional.cosine_similarity(x, y, dim=1,
                                                     eps=eps).abs_()

    def _projection(self, p, grad, perturb, delta, wd_ratio, eps):
        wd = 1.0
        expand_size = [-1] + [1] * (len(p.shape) - 1)
        for view_func in (self._channel_view, self._layer_view):
            cosine_sim = self._cosine_similarity(grad, p.data, eps,
                                                 view_func)
            if cosine_sim.max() < delta / math.sqrt(
                    view_func(p.data).size(1)):
                p_n = p.data / view_func(p.data).norm(dim=1).view(
                    expand_size).add_(eps)
                perturb -= p_n * view_func(p_n * perturb).sum(
                    dim=1).view(expand_size)
                wd = wd_ratio
                return perturb, wd
        return perturb, wd

    @torch.no_grad()
    def step(self, closure=None):
        loss = None
        if closure is not None:
            with torch.enable_grad():
                loss = closure()
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                grad = p.grad.data
                beta1, beta2 = group["betas"]
                nesterov = group["nesterov"]
                state = self.state[p]
                if len(state) == 0:
                    state["step"] = 0
                    state["exp_avg"] = torch.zeros_like(p.data)
                    state["exp_avg_sq"] = torch.zeros_like(p.data)
                exp_avg, exp_avg_sq = (state["exp_avg"],
                                       state["exp_avg_sq"])
                state["step"] += 1
                bias_correction1 = 1 - beta1 ** state["step"]
                bias_correction2 = 1 - beta2 ** state["step"]

                exp_avg.mul_(beta1).add_(grad, alpha=1 - beta1)
                exp_avg_sq.mul_(beta2).addcmul_(grad, grad,
                                                value=1 - beta2)
                denom = (exp_avg_sq / bias_correction2).sqrt_().add_(
                    group["eps"])
                step_size = group["lr"] / bias_correction1
                if nesterov:
                    perturb = (beta1 * exp_avg + (1 - beta1) * grad) \
                        / denom
                else:
                    perturb = exp_avg / denom

                wd_ratio = 1.0
                if len(p.shape) > 1:
                    perturb, wd_ratio = self._projection(
                        p, grad, perturb, group["delta"],
                        group["wd_ratio"], group["eps"])
                if group["weight_decay"] > 0:
                    p.data.mul_(1 - group["lr"] * group["weight_decay"]
                                * wd_ratio)
                p.data.add_(perturb, alpha=-step_size)
        return loss


# ---------------------------------------------------------------------
# torchvision-layout ResNet family (EncoderImage backbone).
# Structure, naming, and init follow torchvision's resnet.py so that
#  (a) `EncoderImage` can strip fc/avgpool and read `.fc.in_features`
#      (src/networks/models/image_encoder.py:24-32);
#  (b) state_dict keys (conv1/bn1/layerN.M.convK/downsample...) feed
#      creamfl_tpu.models.convert.torchvision_resnet_to_flax unchanged.
# ---------------------------------------------------------------------
class _TVBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TVBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TVResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        return self.fc(x)


def _tv_ctor(block, layers):
    def ctor(pretrained=False, **kwargs):
        # No network in this env; both frameworks receive the SAME
        # grafted weights, so the pretrained flag is score-neutral here.
        return _TVResNet(block, layers, **kwargs)
    return ctor


# ---------------------------------------------------------------------
# module assembly
# ---------------------------------------------------------------------
def _module(name, **attrs):
    mod = types.ModuleType(name)
    # A real ModuleSpec so importlib.util.find_spec(name) works (e.g.
    # transformers probes apex availability at import).
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Register all stub modules. Idempotent; never overwrites a module
    that imported for real."""
    if "munch" not in sys.modules:
        _module("munch", Munch=Munch, munchify=munchify,
                unmunchify=unmunchify)

    if "adamp" not in sys.modules:
        _module("adamp", AdamP=AdamP)

    if "apex" not in sys.modules:
        @contextlib.contextmanager
        def _scale_loss(loss, optimizer):
            yield loss

        amp = _module("apex.amp",
                      initialize=lambda model, opt, opt_level=None,
                      **kw: (model, opt),
                      scale_loss=_scale_loss)
        _module("apex", amp=amp)

    if "torchvision" not in sys.modules:
        models = _module(
            "torchvision.models",
            resnet18=_tv_ctor(_TVBasicBlock, [2, 2, 2, 2]),
            resnet34=_tv_ctor(_TVBasicBlock, [3, 4, 6, 3]),
            resnet50=_tv_ctor(_TVBottleneck, [3, 4, 6, 3]),
            resnet101=_tv_ctor(_TVBottleneck, [3, 4, 23, 3]),
            resnet152=_tv_ctor(_TVBottleneck, [3, 8, 36, 3]))

        class _NotWired:
            """Placeholder for torchvision surfaces the oracle bypasses
            (datasets); loud if ever actually constructed."""

            def __init__(self, *a, **k):
                raise RuntimeError("torchvision stub: not available in "
                                   "the oracle environment")

        class _IdentityTransform:
            """Constructible-but-inert transform: ClientTrainer.loadData
            unconditionally builds a Compose pipeline
            (ClientTrainer.py:230-235) even when the oracle injects raw
            tensors, so construction must succeed; the oracle's fake
            datasets never APPLY transforms, so __call__ is identity."""

            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        transforms = _module(
            "torchvision.transforms",
            **{name: _IdentityTransform for name in
               ("Compose", "Resize", "RandomRotation", "RandomCrop",
                "RandomHorizontalFlip", "RandomResizedCrop", "ToTensor",
                "Normalize", "CenterCrop", "RandomErasing")})
        cifar = _module("torchvision.datasets.cifar",
                        CIFAR100=_NotWired, CIFAR10=_NotWired)

        class _CocoDetection:
            """Base class only (src/datasets/coco.py:154,196 subclass it
            for two DEAD retrieval datasets — never instantiated)."""

            def __init__(self, *a, **k):
                raise RuntimeError("torchvision stub: not available in "
                                   "the oracle environment")

        tv_coco = _module("torchvision.datasets.coco",
                          CocoDetection=_CocoDetection,
                          CocoCaptions=_NotWired)
        datasets = _module("torchvision.datasets", cifar=cifar,
                           coco=tv_coco, CocoDetection=_CocoDetection,
                           CIFAR100=_NotWired, CIFAR10=_NotWired)
        _module("torchvision", models=models, transforms=transforms,
                datasets=datasets)

    if "torchtext" not in sys.modules:
        def _not_wired(*a, **k):
            raise RuntimeError("torchtext stub: not available in the "
                               "oracle environment")

        class _EmptyGloVe:
            """GloVe with an empty vocabulary (zero-egress env, no cache
            on disk). Both EncoderText.init_weights variants
            (caption_encoder.py:60-85, language_model.py:66-91) then
            keep their default embedding init for every word — and the
            oracle grafts identical weights into both frameworks
            afterwards, so the pretrained-embedding init cancels
            exactly. ``word_dim`` kwarg feeds the reference's
            ``wemb.vectors.shape[1] == word_dim`` assertion."""

            def __init__(self, cache=None, word_dim=300, **kw):
                self.stoi = {}
                self.vectors = torch.zeros(1, word_dim)

        data_utils = _module("torchtext.data.utils",
                             get_tokenizer=_not_wired)
        data = _module("torchtext.data", utils=data_utils)
        vocab = _module("torchtext.vocab", GloVe=_EmptyGloVe,
                        FastText=_EmptyGloVe,
                        build_vocab_from_iterator=_not_wired)
        tt_datasets = _module("torchtext.datasets", AG_NEWS=_not_wired)
        _module("torchtext", data=data, vocab=vocab,
                datasets=tt_datasets)

    if "fire" not in sys.modules:
        # src/datasets/vocab.py imports `fire` for its __main__ CLI.
        _module("fire", Fire=lambda *a, **k: None)

    if "pycocotools" not in sys.modules:
        class _COCO:
            def __init__(self, *a, **k):
                raise RuntimeError("pycocotools stub: no COCO on disk")

        coco = _module("pycocotools.coco", COCO=_COCO)
        _module("pycocotools", coco=coco)


# ---------------------------------------------------------------------
# cuda -> cpu shims. The reference hard-codes CUDA throughout
# (ClientTrainer.py:111,196-197,370; MMClientTrainer.py:93-94,149;
# MMFL.py:118,309; eval_coco device args); on this CPU-only host the
# oracle reroutes every device move to 'cpu' so the SAME code runs
# unmodified. All patches are recorded and undone by the returned
# callable so they cannot leak into other test modules in a shared
# pytest process.
# ---------------------------------------------------------------------
def _is_cuda_dev(d):
    return ((isinstance(d, str) and d.startswith("cuda"))
            or (isinstance(d, torch.device) and d.type == "cuda"))


def install_cuda_shims():
    """Patch torch so `.cuda()` / `.to('cuda:0')` land on cpu, cuda
    seeding/cache calls no-op, `torch.cuda.is_available()` reports True
    (ClientTrainer.setsys aborts client construction otherwise,
    ClientTrainer.py:220-223), and `model_zoo.load_url` returns an empty
    state dict (zero-egress: `resnet18_client(pretrained=True)` then
    keeps its local init, resnet_client.py:226-231 — score-neutral
    because the oracle grafts identical weights into both frameworks).

    Returns an `undo()` callable restoring every patched attribute.
    """
    import torch.utils.model_zoo as model_zoo

    saved = {
        "tensor_to": torch.Tensor.to,
        "tensor_cuda": torch.Tensor.cuda,
        "module_cuda": nn.Module.cuda,
        "is_available": torch.cuda.is_available,
        "manual_seed": torch.cuda.manual_seed,
        "manual_seed_all": torch.cuda.manual_seed_all,
        "empty_cache": torch.cuda.empty_cache,
        "load_url": model_zoo.load_url,
        "ones": torch.ones,
        "zeros": torch.zeros,
    }

    def _factory_cpu(fn):
        # MCSoftContrastiveLoss builds its parameters with
        # torch.ones(1, device="cuda:0") when cuda "is available"
        # (probemb.py:125-126) — factories take the device kwarg
        # directly, bypassing Tensor.to.
        def wrapped(*args, **kwargs):
            if _is_cuda_dev(kwargs.get("device")):
                kwargs["device"] = "cpu"
            return fn(*args, **kwargs)
        return wrapped
    orig_to = torch.Tensor.to

    def to_cpu(self, *args, **kwargs):
        args = tuple("cpu" if _is_cuda_dev(a) else a for a in args)
        if _is_cuda_dev(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = to_cpu
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: True
    torch.cuda.manual_seed = lambda s: None
    torch.cuda.manual_seed_all = lambda s: None
    torch.cuda.empty_cache = lambda: None
    model_zoo.load_url = lambda *a, **k: {}
    torch.ones = _factory_cpu(saved["ones"])
    torch.zeros = _factory_cpu(saved["zeros"])

    def undo():
        torch.ones = saved["ones"]
        torch.zeros = saved["zeros"]
        torch.Tensor.to = saved["tensor_to"]
        torch.Tensor.cuda = saved["tensor_cuda"]
        nn.Module.cuda = saved["module_cuda"]
        torch.cuda.is_available = saved["is_available"]
        torch.cuda.manual_seed = saved["manual_seed"]
        torch.cuda.manual_seed_all = saved["manual_seed_all"]
        torch.cuda.empty_cache = saved["empty_cache"]
        model_zoo.load_url = saved["load_url"]

    return undo
