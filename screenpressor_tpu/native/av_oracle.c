/* Independent-oracle shim: decode SCPR streams through the system libavcodec.
 *
 * FFmpeg ships its own clean-room SCPR decoder (libavcodec/scpr.c, supports
 * stream versions 1-3; v4 is rejected).  We use it as an *independent* oracle
 * for our v2/v3 interop streams: our own encoder/decoder pair round-trips by
 * construction, so only a third-party decoder can catch mirror-image bugs in
 * the frame-walk semantics.
 *
 * Interface (ctypes-friendly, no libav types leak out):
 *   void *avscpr_new(int w, int h);            // NULL on failure
 *   int   avscpr_decode(void *h, const uint8_t *data, long size,
 *                       int keyframe, uint8_t *out_rgb24);
 *         // 0 = frame decoded into out_rgb24 (h*w*3, row-major)
 *         // 1 = no new frame (EAGAIN: 1-byte "no change" packet) -- caller
 *         //     repeats the previous frame
 *         // <0 = error
 *   void  avscpr_free(void *h);
 */
#include <libavcodec/avcodec.h>
#include <libavutil/pixdesc.h>
#include <string.h>
#include <stdlib.h>

typedef struct {
    AVCodecContext *ctx;
    AVPacket *pkt;
    AVFrame *frame;
    int w, h;
} AvScpr;

void *avscpr_new(int w, int h) {
    const AVCodec *codec = avcodec_find_decoder_by_name("scpr");
    if (!codec) return NULL;
    AvScpr *s = (AvScpr *)calloc(1, sizeof(AvScpr));
    s->w = w; s->h = h;
    s->ctx = avcodec_alloc_context3(codec);
    if (!s->ctx) { free(s); return NULL; }
    s->ctx->width = w;
    s->ctx->height = h;
    s->ctx->bits_per_coded_sample = 24;
    if (avcodec_open2(s->ctx, codec, NULL) < 0) {
        avcodec_free_context(&s->ctx);
        free(s);
        return NULL;
    }
    s->pkt = av_packet_alloc();
    s->frame = av_frame_alloc();
    return s;
}

int avscpr_pix_fmt(void *hd) {  /* after first decode: frame->format */
    AvScpr *s = (AvScpr *)hd;
    return s->frame->format;
}

const char *avscpr_pix_fmt_name(void *hd) {
    AvScpr *s = (AvScpr *)hd;
    return av_get_pix_fmt_name((enum AVPixelFormat)s->frame->format);
}

int avscpr_decode(void *hd, const uint8_t *data, long size, int keyframe,
                  uint8_t *out_rgb24) {
    AvScpr *s = (AvScpr *)hd;
    /* libav requires padded, av-allocated packet buffers */
    uint8_t *buf = (uint8_t *)av_malloc(size + AV_INPUT_BUFFER_PADDING_SIZE);
    if (!buf) return -1;
    memcpy(buf, data, size);
    memset(buf + size, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    av_packet_unref(s->pkt);
    if (av_packet_from_data(s->pkt, buf, size) < 0) { av_free(buf); return -2; }
    if (keyframe) s->pkt->flags |= AV_PKT_FLAG_KEY;

    int rc = avcodec_send_packet(s->ctx, s->pkt);
    if (rc < 0) return -3;
    rc = avcodec_receive_frame(s->ctx, s->frame);
    if (rc == AVERROR(EAGAIN)) return 1;
    if (rc < 0) return -4;

    const AVFrame *f = s->frame;
    int w = s->w, h = s->h;
    if (f->width != w || f->height != h) return -5;
    switch (f->format) {
    case AV_PIX_FMT_RGB0:
    case AV_PIX_FMT_RGBA:
        for (int y = 0; y < h; y++) {
            const uint8_t *src = f->data[0] + (long)y * f->linesize[0];
            uint8_t *dst = out_rgb24 + (long)y * w * 3;
            for (int x = 0; x < w; x++) {
                dst[3 * x + 0] = src[4 * x + 0];
                dst[3 * x + 1] = src[4 * x + 1];
                dst[3 * x + 2] = src[4 * x + 2];
            }
        }
        return 0;
    case AV_PIX_FMT_BGR0:
    case AV_PIX_FMT_BGRA:
        for (int y = 0; y < h; y++) {
            const uint8_t *src = f->data[0] + (long)y * f->linesize[0];
            uint8_t *dst = out_rgb24 + (long)y * w * 3;
            for (int x = 0; x < w; x++) {
                dst[3 * x + 0] = src[4 * x + 2];
                dst[3 * x + 1] = src[4 * x + 1];
                dst[3 * x + 2] = src[4 * x + 0];
            }
        }
        return 0;
    case AV_PIX_FMT_RGB24:
        for (int y = 0; y < h; y++)
            memcpy(out_rgb24 + (long)y * w * 3,
                   f->data[0] + (long)y * f->linesize[0], (size_t)w * 3);
        return 0;
    case AV_PIX_FMT_BGR24:
        for (int y = 0; y < h; y++) {
            const uint8_t *src = f->data[0] + (long)y * f->linesize[0];
            uint8_t *dst = out_rgb24 + (long)y * w * 3;
            for (int x = 0; x < w; x++) {
                dst[3 * x + 0] = src[3 * x + 2];
                dst[3 * x + 1] = src[3 * x + 1];
                dst[3 * x + 2] = src[3 * x + 0];
            }
        }
        return 0;
    default:
        return -6;
    }
}

void avscpr_free(void *hd) {
    AvScpr *s = (AvScpr *)hd;
    if (!s) return;
    av_packet_free(&s->pkt);
    av_frame_free(&s->frame);
    avcodec_free_context(&s->ctx);
    free(s);
}
