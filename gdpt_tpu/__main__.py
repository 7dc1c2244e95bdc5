from gdpt_tpu.cli import main

main()
