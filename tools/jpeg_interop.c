/* Tiny libjpeg CLI used ONLY by the test suite as an interoperability
 * oracle for the pure-Python JPEG codec (ome_arrow_spark/sources/
 * jpeg_minimal.py + jpeg_arith.py).  Compiled on demand by
 * tests/test_jpeg_interop.py when gcc + libjpeg headers are present;
 * the engine itself never calls this.
 *
 *   jpeg_interop enc <w> <h> <ncomp> <quality> <arith> <progressive> <rsti>
 *       raw 8-bit pixels (gray or interleaved RGB) on stdin -> JPEG on stdout
 *   jpeg_interop dec
 *       JPEG on stdin -> "w h ncomp\n" header + raw 8-bit pixels on stdout
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static int run_enc(int argc, char **argv) {
    int w = atoi(argv[2]), h = atoi(argv[3]), nc = atoi(argv[4]);
    int quality = atoi(argv[5]), arith = atoi(argv[6]);
    int progressive = atoi(argv[7]);
    int rsti = argc > 8 ? atoi(argv[8]) : 0;
    size_t n = (size_t)w * h * nc;
    unsigned char *buf = malloc(n);
    if (!buf || fread(buf, 1, n, stdin) != n) {
        fprintf(stderr, "short pixel read\n");
        return 1;
    }
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, stdout);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = nc;
    cinfo.in_color_space = nc == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (arith)
        cinfo.arith_code = TRUE;
    if (progressive)
        jpeg_simple_progression(&cinfo);
    if (rsti > 0)
        cinfo.restart_interval = (unsigned)rsti;
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = buf + (size_t)cinfo.next_scanline * w * nc;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    free(buf);
    return 0;
}

static int run_dec(void) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, stdin);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width, h = cinfo.output_height;
    int nc = cinfo.output_components;
    printf("%d %d %d\n", w, h, nc);
    fflush(stdout);
    unsigned char *row = malloc((size_t)w * nc);
    while ((int)cinfo.output_scanline < h) {
        JSAMPROW r = row;
        jpeg_read_scanlines(&cinfo, &r, 1);
        fwrite(row, 1, (size_t)w * nc, stdout);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    free(row);
    return 0;
}

/* Dump raw quantized DCT coefficients (entropy layer only, no IDCT):
 * per component "comp <ci> <blocks_h> <blocks_w>\n" then rows of 64
 * ints per block in natural order. */
static int run_coef(void) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, stdin);
    jpeg_read_header(&cinfo, TRUE);
    jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
    for (int ci = 0; ci < cinfo.num_components; ci++) {
        jpeg_component_info *comp = cinfo.comp_info + ci;
        int bh = comp->height_in_blocks, bw = comp->width_in_blocks;
        printf("comp %d %d %d\n", ci, bh, bw);
        for (int by = 0; by < bh; by++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
            for (int bx = 0; bx < bw; bx++) {
                for (int k = 0; k < 64; k++)
                    printf("%d ", rows[0][bx][k]);
                printf("\n");
            }
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && strcmp(argv[1], "coef") == 0)
        return run_coef();
    if (argc >= 8 && strcmp(argv[1], "enc") == 0)
        return run_enc(argc, argv);
    if (argc >= 2 && strcmp(argv[1], "dec") == 0)
        return run_dec();
    fprintf(stderr,
            "usage: jpeg_interop enc w h nc quality arith progressive [rsti]"
            " | jpeg_interop dec\n");
    return 2;
}
