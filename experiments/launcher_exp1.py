"""Experiment 1: training-objective ablations on GroZi-3.2k.

Port of the reference experiments/launcher_exp1.py:62-233 job grid: loss type
(ContrastiveLoss vs RLL) x target remapping x hard-patch mining x affine-model
variants (simplified / full inverse affine with weakalign transform init).
Run: python experiments/launcher_exp1.py [--no-launch|--slurm|--xpk ...]
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
from collections import OrderedDict

import yaml

from os2d_tpu.utils import launcher


def load_yaml(config_file):
    with open(config_file, "r") as stream:
        return yaml.safe_load(stream)


if __name__ == "__main__":
    parser = launcher.create_args_parser()
    args = parser.parse_args()

    main_command = "python main.py"
    config_path = os.path.dirname(os.path.abspath(__file__))
    config_file = os.path.join(config_path, "config_training.yml")
    config = load_yaml(config_file)
    config_job_name = "exp1"
    log_path = os.path.abspath(os.path.join(config_path, "..", "output/exp1"))

    def add_job(job_name, sub_index, backbone_arch, init_model_nickname,
                init_model_path, extra_params=None):
        job_name = f"{config_job_name}.{sub_index}.{job_name}_seed{config['random_seed']}"
        d = OrderedDict()
        d["--config-file"] = config_file
        d["model.backbone_arch"] = backbone_arch
        d["init.model"] = init_model_path
        log_folder = os.path.join(
            log_path, f"{job_name}_{backbone_arch}_init_{init_model_nickname}"
        )
        d["output.path"] = log_folder
        if extra_params:
            d.update(extra_params)
        launcher.add_job(job_name, log_folder,
                         [main_command + " " + launcher.parameters_to_str(d)])

    init_path = "models/imagenet-caffe-resnet50-features-ac468af-converted.pth"
    init_nick = "imageNetCaffe2"
    simplified = {
        "model.use_inverse_geom_model": False,
        "model.use_simplified_affine_model": True,
        "train.objective.loc_weight": 0.2,
        "train.model.freeze_bn_transform": False,
    }
    full_affine = {
        "model.use_inverse_geom_model": True,
        "model.use_simplified_affine_model": False,
        "train.objective.loc_weight": 0.0,
        "train.model.freeze_bn_transform": True,
        "init.transform": "models/weakalign_resnet101_affine_tps.pth.tar",
    }

    add_job("lossCL", 0, "ResNet50", init_nick, init_path, {
        **simplified,
        "train.objective.class_objective": "ContrastiveLoss",
        "train.objective.pos_margin": 1.0,
        "train.objective.neg_margin": 0.5,
        "train.objective.remap_classification_targets": False,
    })
    add_job("lossRLL", 1, "ResNet50", init_nick, init_path, {
        **simplified,
        "train.objective.remap_classification_targets": False,
    })
    add_job("lossRLL_remap", 2, "ResNet50", init_nick, init_path, {
        **simplified,
    })
    add_job("lossCL_mine", 3, "ResNet50", init_nick, init_path, {
        **simplified,
        "train.objective.class_objective": "ContrastiveLoss",
        "train.objective.pos_margin": 1.0,
        "train.objective.neg_margin": 0.5,
        "train.objective.remap_classification_targets": False,
        "train.mining.do_mining": True,
    })
    add_job("lossRLL_mine", 4, "ResNet50", init_nick, init_path, {
        **simplified,
        "train.objective.remap_classification_targets": False,
        "train.mining.do_mining": True,
    })
    add_job("lossRLL_remap_mine", 5, "ResNet50", init_nick, init_path, {
        **simplified,
        "train.mining.do_mining": True,
    })
    add_job("lossRLL_remap_invFullAffine", 6, "ResNet50", init_nick, init_path, {
        **full_affine,
        "train.objective.loc_weight": 0.2,
    })
    add_job("lossRLL_remap_invFullAffine_initTranform", 7, "ResNet50",
            init_nick, init_path, {
        **full_affine,
        "train.objective.loc_weight": 0.2,
    })
    add_job("lossRLL_remap_invFullAffine_initTranform_zeroLocLoss", 8,
            "ResNet50", init_nick, init_path, {
        **full_affine,
    })
    add_job("lossRLL_remap_invFullAffine_initTranform_zeroLocLoss_mine", 9,
            "ResNet50", init_nick, init_path, {
        **full_affine,
        "train.mining.do_mining": True,
    })
    add_job("lossCL_invFullAffine_initTranform_zeroLocLoss", 10, "ResNet50",
            init_nick, init_path, {
        **full_affine,
        "train.objective.class_objective": "ContrastiveLoss",
        "train.objective.pos_margin": 1.0,
        "train.objective.neg_margin": 0.5,
        "train.objective.remap_classification_targets": False,
    })
    add_job("lossRLL_invFullAffine_initTranform_zeroLocLoss", 11, "ResNet50",
            init_nick, init_path, {
        **full_affine,
        "train.objective.remap_classification_targets": False,
    })

    launcher.launch_all_jobs(args)
