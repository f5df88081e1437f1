"""Base CLI flags (reference DSGAN/options/base_options.py, same names and
defaults so reference command lines run unchanged), plus TPU-native flags
(--dtype, --vgg_weights, --seed, --data_axis/--spatial_axis mesh shape).

Deviations (defects fixed, documented):
  * numeric flags (use_GAN, w_*, use_condition) are typed — the reference
    leaves them untyped so CLI overrides silently became strings;
  * --gpu_ids is accepted-and-ignored (device selection is JAX's).
"""

import argparse
import os

from dsgan_tpu.utils import util


class BaseOptions:
    def __init__(self):
        self.initialized = False

    def initialize(self, parser):
        parser.add_argument("--dataroot", type=str, default="./datasets",
                            help="path to images (subfolders per phase)")
        parser.add_argument("--batchSize", type=int, default=1, help="input batch size")
        parser.add_argument("--loadSize_w", type=int, default=256, help="scale images to this size")
        parser.add_argument("--fineSize_w", type=int, default=256, help="then crop to this size")
        parser.add_argument("--loadSize_h", type=int, default=256, help="scale images to this size")
        parser.add_argument("--fineSize_h", type=int, default=256, help="then crop to this size")
        parser.add_argument("--input_nc", type=int, default=3, help="# of input image channels")
        parser.add_argument("--output_nc", type=int, default=3, help="# of output image channels")
        parser.add_argument("--ngf", type=int, default=32, help="# of gen filters in first conv layer")
        parser.add_argument("--ndf", type=int, default=32, help="# of discrim filters in first conv layer")
        parser.add_argument("--which_model_netD", type=str, default="basic", help="selects model to use for netD")
        parser.add_argument("--which_model_netG", type=str, default="MixConvNeXtML", help="selects model to use for netG")
        parser.add_argument("--n_layers_D", type=int, default=3, help="only used if which_model_netD==n_layers")
        parser.add_argument("--gpu_ids", type=str, default="0",
                            help="accepted for reference-CLI parity; devices are managed by JAX")
        parser.add_argument("--name", type=str, default="experiment_name",
                            help="name of the experiment; decides where samples and models are stored")
        parser.add_argument("--dataset_mode", type=str, default="aligned",
                            help="chooses how datasets are loaded. [unaligned | aligned | single]")
        parser.add_argument("--model", type=str, default="pix2pix",
                            help="chooses which model to use. cycle_gan, pix2pix, test")
        parser.add_argument("--which_direction", type=str, default="AtoB", help="AtoB or BtoA")
        parser.add_argument("--nThreads", default=4, type=int, help="# threads for loading data")
        parser.add_argument("--checkpoints_dir", type=str, default="./checkpoints/", help="models are saved here")
        parser.add_argument("--norm", type=str, default="instance",
                            help="instance normalization or batch normalization")
        parser.add_argument("--serial_batches", action="store_true",
                            help="if true, takes images in order to make batches, otherwise randomly")
        parser.add_argument("--display_winsize", type=int, default=256, help="display window size")
        parser.add_argument("--display_id", type=int, default=1, help="window id of the web display")
        parser.add_argument("--display_server", type=str, default="http://localhost", help="visdom server")
        parser.add_argument("--display_port", type=int, default=8097, help="visdom port")
        parser.add_argument("--no_dropout", action="store_true", help="no dropout for the generator")
        parser.add_argument("--max_dataset_size", type=float, default=float("inf"),
                            help="maximum number of samples per dataset")
        parser.add_argument("--resize_or_crop", type=str, default="resize_and_crop",
                            help="[resize_and_crop|crop|scale_width|scale_width_and_crop]")
        parser.add_argument("--no_flip", action="store_true", help="do not flip images for augmentation")
        parser.add_argument("--init_type", type=str, default="normal",
                            help="network initialization [normal|xavier|kaiming|orthogonal]")
        parser.add_argument("--verbose", action="store_true", help="print more debugging information")
        parser.add_argument("--suffix", default="", type=str,
                            help="customized suffix: opt.name = opt.name + suffix")
        parser.add_argument("--use_GAN", type=int, default=1, help="1 is use gan")
        parser.add_argument("--w_gan", type=float, default=0.01, help="weight of the gan loss")
        parser.add_argument("--w_vgg", type=float, default=1.0, help="weight of the vgg loss")
        parser.add_argument("--w_tv", type=float, default=1.0, help="weight of the tv loss")
        parser.add_argument("--w_ss", type=float, default=1.25, help="weight of the ms-ssim loss")
        parser.add_argument("--use_condition", type=int, default=1,
                            help="1 means add condition in discriminator")
        # ---- TPU-native flags
        parser.add_argument("--dtype", type=str, default="bfloat16",
                            help="compute dtype for the networks [bfloat16|float32]; params are float32")
        parser.add_argument("--vgg_weights", type=str, default="",
                            help="path to converted torchvision vgg16 .npz for the perceptual loss "
                                 "(see dsgan_tpu.utils.pth_convert.convert_vgg16)")
        parser.add_argument("--seed", type=int, default=20, help="global RNG seed")
        parser.add_argument("--native_loader", type=str, default="auto",
                            help="C++ decode/augment runtime: auto|off")
        parser.add_argument("--remat", action="store_true",
                            help="rematerialize generator blocks (memory for FLOPs; "
                                 "enables larger batch / 512^2-class inputs)")
        parser.add_argument("--gelu", type=str, default="exact",
                            help="GELU flavor [exact|tanh]; exact matches torch nn.GELU")
        parser.add_argument("--data_axis", type=int, default=0,
                            help="data-parallel mesh size; 0 = all visible devices")
        parser.add_argument("--spatial_axis", type=int, default=1,
                            help="spatial-parallel mesh size (halo-exchange sharding)")
        self.initialized = True
        return parser

    def gather_options(self, argv=None):
        if not self.initialized:
            parser = argparse.ArgumentParser(
                formatter_class=argparse.ArgumentDefaultsHelpFormatter
            )
            parser = self.initialize(parser)

        opt, _ = parser.parse_known_args(argv)

        # let the selected training algorithm inject its flags
        from dsgan_tpu import models

        model_option_setter = models.get_option_setter(opt.model)
        parser = model_option_setter(parser, self.isTrain)

        self.parser = parser
        return parser.parse_args(argv)

    def print_options(self, opt):
        message = ""
        message += "----------------- Options ---------------\n"
        for k, v in sorted(vars(opt).items()):
            comment = ""
            default = self.parser.get_default(k)
            if v != default:
                comment = "\t[default: %s]" % str(default)
            message += "{:>25}: {:<30}{}\n".format(str(k), str(v), comment)
        message += "----------------- End -------------------"
        print(message)

        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        util.mkdirs(expr_dir)
        with open(os.path.join(expr_dir, "opt.txt"), "wt") as f:
            f.write(message)
            f.write("\n")

    def parse(self, dataset_path=None, path=None, argv=None):
        opt = self.gather_options(argv)
        opt.isTrain = self.isTrain
        if getattr(opt, "gelu", "exact") == "tanh":
            from dsgan_tpu.models.layers import set_gelu_mode

            set_gelu_mode(True)
        if path is not None:
            opt.checkpoints_dir = os.path.join(path, "checkpoints")
        if dataset_path is not None:
            opt.dataroot = dataset_path

        if opt.suffix:
            suffix = ("_" + opt.suffix.format(**vars(opt))) if opt.suffix != "" else ""
            opt.name = opt.name + suffix

        self.print_options(opt)
        self.opt = opt
        return self.opt
