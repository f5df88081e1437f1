"""Training flags (reference DSGAN/options/train_options.py, same
names/defaults: 21-epoch recipe, Adam lr=2e-4 beta1=0.5, pool 50)."""

from dsgan_tpu.options.base_options import BaseOptions


class TrainOptions(BaseOptions):
    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.add_argument("--display_freq", type=int, default=100,
                            help="frequency of showing training results on screen")
        parser.add_argument("--display_ncols", type=int, default=4,
                            help="images per row in the web panel")
        parser.add_argument("--update_html_freq", type=int, default=1000,
                            help="frequency of saving training results to html")
        parser.add_argument("--print_freq", type=int, default=100,
                            help="frequency of showing training results on console")
        parser.add_argument("--save_latest_freq", type=int, default=5000,
                            help="frequency of saving the latest results")
        parser.add_argument("--save_epoch_freq", type=int, default=50,
                            help="frequency of saving checkpoints at the end of epochs")
        parser.add_argument("--continue_train", action="store_true", default=False,
                            help="continue training: load the latest model")
        parser.add_argument("--epoch_count", type=int, default=1,
                            help="the starting epoch count")
        parser.add_argument("--phase", type=str, default="train_all/", help="train, val, test, etc")
        parser.add_argument("--which_epoch", type=str, default="1",
                            help="which epoch to load? set to latest to use latest cached model")
        parser.add_argument("--niter", type=int, default=10,
                            help="# of iter at starting learning rate")
        parser.add_argument("--niter_decay", type=int, default=10,
                            help="# of iter to linearly decay learning rate to zero")
        parser.add_argument("--beta1", type=float, default=0.5, help="momentum term of adam")
        parser.add_argument("--lr", type=float, default=0.0002, help="initial learning rate for adam")
        parser.add_argument("--no_lsgan", action="store_true",
                            help="do *not* use least square GAN, if false, use vanilla GAN")
        parser.add_argument("--pool_size", type=int, default=50,
                            help="the size of image buffer that stores previously generated images")
        parser.add_argument("--no_html", action="store_true",
                            help="do not save intermediate training results to web/")
        parser.add_argument("--lr_policy", type=str, default="lambda",
                            help="learning rate policy: lambda|step|plateau")
        parser.add_argument("--lr_decay_iters", type=int, default=50,
                            help="multiply by a gamma every lr_decay_iters iterations")
        # ---- TPU-native observability
        parser.add_argument("--profile_dir", type=str, default="",
                            help="write a jax.profiler trace (TensorBoard format) here")
        parser.add_argument("--profile_steps", type=str, default="10:13",
                            help="start:stop step range captured by the profiler")
        self.isTrain = True
        return parser
